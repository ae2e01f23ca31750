#!/usr/bin/env bash
# Experiment battery: train every headline architecture on a shared dataset.
# ~ reference scripts/run_all_experiments.sh (setsid/nohup battery with
# per-run logs and done-flags so interrupted batteries resume).
#
# Usage: scripts/run_all_experiments.sh <base_dir> [processors...]
set -u
BASE=${1:-experiments_out}; shift || true
PROCESSORS=${@:-"conv_gcn conv_gat sparse_gat interaction_net"}
mkdir -p "$BASE"
cd "$(dirname "$0")/.."

for PROC in $PROCESSORS; do
  EXP="$BASE/$PROC"
  DONE="$EXP/.done"
  if [ -f "$DONE" ]; then
    echo "[skip] $PROC (done-flag present)"
    continue
  fi
  mkdir -p "$EXP"
  echo "[run] $PROC -> $EXP"
  python -m graphcast_lite_tpu.cli.make_demo "$EXP" --size medium \
      --processor "$PROC" > "$EXP/setup.log" 2>&1 \
    && python -m graphcast_lite_tpu.cli.train "$EXP" \
      > "$EXP/train.log" 2>&1 \
    && touch "$DONE" \
    || echo "[fail] $PROC (see $EXP/*.log)"
done
echo "[battery] complete"
