#!/usr/bin/env bash
# Data-assimilation parameter sweep over a trained experiment.
# ~ reference scripts/da_experiments_*.sh / da_grid_search.sh /
# run_da_full_sweep.sh: grid over method x strength x station density,
# one JSON report per cell, resumable via report-file presence.
#
# Usage: scripts/da_sweep.sh <exp_dir> [max_samples]
set -u
EXP=$1
MAX=${2:-50}
OUT="$EXP/da_sweep"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

for SPARSITY in 0.05 0.1 0.2; do
  for ALPHA in 0.25 0.5 0.75; do
    TAG="nudge_a${ALPHA}_s${SPARSITY}"
    [ -f "$OUT/$TAG.json" ] && { echo "[skip] $TAG"; continue; }
    python -m graphcast_lite_tpu.cli.predict "$EXP" \
      --da nudging --da-alpha "$ALPHA" --obs-sparsity "$SPARSITY" \
      --max-samples "$MAX" --report-json "$OUT/$TAG.json" \
      > "$OUT/$TAG.log" 2>&1 || echo "[fail] $TAG"
    echo "[done] $TAG"
  done
  for LKM in 50 150 300; do
    TAG="oi_L${LKM}_s${SPARSITY}"
    [ -f "$OUT/$TAG.json" ] && { echo "[skip] $TAG"; continue; }
    python -m graphcast_lite_tpu.cli.predict "$EXP" \
      --da oi --oi-length-km "$LKM" --oi-sigma-o 0.5 \
      --obs-sparsity "$SPARSITY" --max-samples "$MAX" \
      --report-json "$OUT/$TAG.json" > "$OUT/$TAG.log" 2>&1 \
      || echo "[fail] $TAG"
    echo "[done] $TAG"
  done
done

python - "$OUT" <<'PY'
import glob, json, os, sys
out = sys.argv[1]
rows = []
for p in sorted(glob.glob(os.path.join(out, "*.json"))):
    r = json.load(open(p))
    rows.append((os.path.basename(p)[:-5], r["skill"], r["rmse"]))
rows.sort(key=lambda r: -r[1])
print(f"{'config':>22s} {'skill':>8s} {'rmse':>10s}")
for name, skill, rmse in rows:
    print(f"{name:>22s} {skill*100:7.2f}% {rmse:10.6f}")
PY
