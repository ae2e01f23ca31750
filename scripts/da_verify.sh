#!/usr/bin/env bash
# Re-run the best DA configurations and verify the recorded sweep results
# reproduce (~ reference scripts/da_v3_verify.sh): each chosen cell is
# re-executed with the same seed and compared against its da_sweep JSON to
# a relative tolerance.
#
# Usage: scripts/da_verify.sh <exp_dir> [max_samples] [rtol]
set -u
EXP=$1
MAX=${2:-50}
RTOL=${3:-0.02}
OUT="$EXP/da_sweep"
VER="$EXP/da_verify"
mkdir -p "$VER"
cd "$(dirname "$0")/.."

[ -d "$OUT" ] || { echo "no $OUT — run scripts/da_sweep.sh first"; exit 1; }

python - "$OUT" <<'PY' > "$VER/targets.txt"
import glob, json, os, sys
rows = []
for p in sorted(glob.glob(os.path.join(sys.argv[1], "*.json"))):
    name = os.path.basename(p)[:-5]
    if name == "baseline":
        continue
    rows.append((json.load(open(p)).get("skill", 0.0), name))
rows.sort(reverse=True)
for _, name in rows[:2]:
    print(name)
PY

FAIL=0
while read -r TAG; do
  ARGS=""
  case "$TAG" in
    nudge_a*)
      A=$(echo "$TAG" | sed -E 's/nudge_a([0-9.]+)_s([0-9.]+).*/\1/')
      S=$(echo "$TAG" | sed -E 's/nudge_a([0-9.]+)_s([0-9.]+).*/\2/')
      ARGS="--da nudging --da-alpha $A --obs-sparsity $S";;
    oi_L*)
      L=$(echo "$TAG" | sed -E 's/oi_L([0-9.]+)_so([0-9.]+)_s([0-9.]+).*/\1/')
      SO=$(echo "$TAG" | sed -E 's/oi_L([0-9.]+)_so([0-9.]+)_s([0-9.]+).*/\2/')
      S=$(echo "$TAG" | sed -E 's/oi_L([0-9.]+)_so([0-9.]+)_s([0-9.]+).*/\3/')
      ARGS="--da oi --oi-length-km $L --oi-sigma-o $SO --obs-sparsity $S";;
    *) echo "[skip] unrecognized tag $TAG"; continue;;
  esac
  case "$TAG" in *_k*) K=$(echo "$TAG" | sed -E 's/.*_k([0-9]+)$/\1/')
    ARGS="$ARGS --da-steps $K";; esac
  python -m graphcast_lite_tpu.cli.predict "$EXP" $ARGS \
    --max-samples "$MAX" --report-json "$VER/$TAG.json" \
    > "$VER/$TAG.log" 2>&1 || { echo "[fail-run] $TAG"; FAIL=1; continue; }
  python - "$OUT/$TAG.json" "$VER/$TAG.json" "$RTOL" <<'PY' || FAIL=1
import json, sys
a = json.load(open(sys.argv[1]))["skill"]
b = json.load(open(sys.argv[2]))["skill"]
rtol = float(sys.argv[3])
ok = abs(a - b) <= rtol * max(abs(a), 1e-9)
print(f"{'OK ' if ok else 'MISMATCH'} {sys.argv[1].split('/')[-1][:-5]}: "
      f"recorded {a:.5f} vs re-run {b:.5f}")
sys.exit(0 if ok else 1)
PY
done < "$VER/targets.txt"

[ "$FAIL" = 0 ] && echo "[da_verify] all reproduced" || {
  echo "[da_verify] FAILURES"; exit 1; }
