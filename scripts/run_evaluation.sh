#!/usr/bin/env bash
# Evaluation pipeline for a trained experiment: inference -> per-channel
# tables -> metric maps -> DA comparison -> summary.
# ~ reference scripts/run_evaluation.sh.
#
# Usage: scripts/run_evaluation.sh <exp_dir> [ar_steps]
set -eu
EXP=$1
AR=${2:-4}
cd "$(dirname "$0")/.."

python -m graphcast_lite_tpu.cli.predict "$EXP" --ar-steps "$AR" \
    --per-channel --save-preds "$EXP/predictions.npz" \
    --report-json "$EXP/eval_report.json" | tee "$EXP/eval.log"

python -m graphcast_lite_tpu.cli.predict "$EXP" --ar-steps "$AR" \
    --da nudging --da-alpha 0.5 --obs-sparsity 0.1 \
    --report-json "$EXP/eval_nudging.json" | tee -a "$EXP/eval.log"

python - "$EXP" <<'PY'
import json, sys, numpy as np
from graphcast_lite_tpu.inference.maps import pixel_metrics, plot_metric_maps
exp = sys.argv[1]
blob = np.load(f"{exp}/predictions.npz")
rep = json.load(open(f"{exp}/eval_report.json"))
c = int(blob["n_features"])
m = pixel_metrics(blob["predictions"], blob["ground_truth"], c)
n_lat, n_lon = int(blob["n_lat"]), int(blob["n_lon"])
if n_lat and n_lon:
    lats = np.arange(n_lat); lons = np.arange(n_lon)
    plot_metric_maps(m, lats, lons, 0, f"{exp}/metric_maps.png")
    print(f"maps -> {exp}/metric_maps.png")
print(f"skill {rep['skill']*100:.2f}%")
PY

# Comparison figures (raw vs DA) + MOS/IDW parameter sweep
# (~ reference plot_compare_algos.py / plot_diff.py / mos_idw_sweep.py).
DATA=$(python -c "import json;print(json.load(open('$EXP/config.json'))['data_dir'])")
python -m graphcast_lite_tpu.cli.predict "$EXP" --ar-steps "$AR" \
    --da nudging --da-alpha 0.5 --obs-sparsity 0.1 \
    --save-preds "$EXP/predictions_nudging.npz" >/dev/null || true
if [ -f "$EXP/predictions_nudging.npz" ]; then
  python -m graphcast_lite_tpu.cli.plot_compare --data-dir "$DATA" \
      --out-dir "$EXP/figs" --preds "raw=$EXP/predictions.npz" \
      --preds "nudging=$EXP/predictions_nudging.npz" | tee -a "$EXP/eval.log"
fi
python -m graphcast_lite_tpu.cli.mos_idw_sweep \
    --preds "$EXP/predictions.npz" --data-dir "$DATA" \
    | tee -a "$EXP/eval.log" || true
echo "[evaluation] complete"
