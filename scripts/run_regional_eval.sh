#!/usr/bin/env bash
# Global + region + city evaluation battery for a trained experiment.
# ~ reference scripts/run_all_eval.sh + run_merge_eval.sh: one predict run
# per evaluation surface (global metrics, region bbox, city bbox), each with
# per-channel tables, logged to per-run files with a resumable status log.
#
# Usage: scripts/run_regional_eval.sh <exp_dir> [max_samples]
#   REGION_BBOX / CITY_BBOX override the default Krasnoyarsk boxes
#   ("lat0 lat1 lon0 lon1").
set -u
EXP=$1
MAX=${2:-50}
REGION=${REGION_BBOX:-"50 60 83 98"}
CITY=${CITY_BBOX:-"55.5 56.5 92 94"}
OUT="$EXP/eval_battery"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
STATUS="$OUT/status.log"

run() {
  local TAG=$1; shift
  if [ -f "$OUT/$TAG.json" ]; then
    echo "[skip] $TAG" | tee -a "$STATUS"; return
  fi
  echo "=== $TAG $(date '+%H:%M:%S') ===" | tee -a "$STATUS"
  python -m graphcast_lite_tpu.cli.predict "$EXP" \
    --max-samples "$MAX" --per-channel \
    --report-json "$OUT/$TAG.json" "$@" > "$OUT/$TAG.log" 2>&1 \
    && echo "DONE $TAG" | tee -a "$STATUS" \
    || echo "FAIL $TAG" | tee -a "$STATUS"
}

run global
run region --region $REGION
run city   --region $CITY

python - "$OUT" <<'PY'
import glob, json, os, sys
out = sys.argv[1]
print(f"{'surface':>8s} {'skill':>8s} {'rmse':>10s} {'acc':>8s}  region")
for p in sorted(glob.glob(os.path.join(out, "*.json"))):
    r = json.load(open(p))
    name = os.path.basename(p)[:-5]
    reg = r.get("region") or {}
    line = (f"{name:>8s} {r['skill']*100:7.2f}% {r['rmse']:10.6f} "
            f"{r['acc']:8.4f}")
    if reg:
        line += (f"  [region: skill={reg['skill']*100:.2f}% "
                 f"rmse={reg['rmse']:.6f} nodes={reg['num_nodes']}]")
    print(line)
PY
