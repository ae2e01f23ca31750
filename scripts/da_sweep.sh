#!/usr/bin/env bash
# Data-assimilation parameter sweep over a trained experiment.
# ~ reference DA battery (scripts/da_grid_search.sh, run_da_full_sweep.sh,
# da_experiments_{v2,v3,global,merge}.sh): grid over
#   nudging: alpha x station density,
#   OI:      correlation length x sigma_o x station density,
#   assimilation steps k (how many AR steps receive observations),
# one JSON report per cell, resumable via report-file presence, and a final
# ranking table in the shape of reference DA_EXPERIMENTS_GLOBAL_RESULTS.md.
#
# Usage: scripts/da_sweep.sh <exp_dir> [max_samples] [--quick]
set -u
EXP=$1
MAX=${2:-50}
QUICK=${3:-}
OUT="$EXP/da_sweep"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run_cell() {
  local TAG=$1; shift
  [ -f "$OUT/$TAG.json" ] && { echo "[skip] $TAG"; return; }
  python -m graphcast_lite_tpu.cli.predict "$EXP" \
    --max-samples "$MAX" --report-json "$OUT/$TAG.json" "$@" \
    > "$OUT/$TAG.log" 2>&1 || { echo "[fail] $TAG"; return; }
  echo "[done] $TAG"
}

# Baseline (no DA) anchors the skill deltas.
run_cell "baseline" --da none

if [ "$QUICK" = "--quick" ]; then
  SPARSITIES="0.1"; ALPHAS="0.5"; LENGTHS="150"; SIGMAS="0.5"; KSTEPS="2"
else
  SPARSITIES="0.01 0.05 0.1"
  ALPHAS="0.1 0.25 0.5 0.7"
  LENGTHS="50 100 150 200 300"
  SIGMAS="0.3 0.5 1.0"
  KSTEPS="1 2 4"
fi

for SPARSITY in $SPARSITIES; do
  # -- nudging: alpha sweep -------------------------------------------------
  for ALPHA in $ALPHAS; do
    run_cell "nudge_a${ALPHA}_s${SPARSITY}" \
      --da nudging --da-alpha "$ALPHA" --obs-sparsity "$SPARSITY"
  done
  # -- OI: correlation length x sigma_o ------------------------------------
  for LKM in $LENGTHS; do
    for SO in $SIGMAS; do
      run_cell "oi_L${LKM}_so${SO}_s${SPARSITY}" \
        --da oi --oi-length-km "$LKM" --oi-sigma-o "$SO" \
        --obs-sparsity "$SPARSITY"
    done
  done
done

# -- assimilation-steps dimension (best-class configs; reference v2/v3) -----
for K in $KSTEPS; do
  run_cell "oi_L150_so0.5_s0.1_k${K}" \
    --da oi --oi-length-km 150 --oi-sigma-o 0.5 --obs-sparsity 0.1 \
    --da-steps "$K"
  run_cell "nudge_a0.5_s0.1_k${K}" \
    --da nudging --da-alpha 0.5 --obs-sparsity 0.1 --da-steps "$K"
done

# -- final comparison table (reference DA_EXPERIMENTS_GLOBAL_RESULTS.md) ----
python - "$OUT" <<'PY'
import glob, json, os, sys
out = sys.argv[1]
rows, base = [], None
for p in sorted(glob.glob(os.path.join(out, "*.json"))):
    name = os.path.basename(p)[:-5]
    r = json.load(open(p))
    hor = {h["horizon"]: h for h in r.get("per_horizon", [])}
    row = {
        "name": name, "skill": r.get("skill", 0.0), "rmse": r.get("rmse"),
        "acc": r.get("acc"),
        "h6": hor.get(6, {}).get("skill"), "h24": hor.get(24, {}).get("skill"),
    }
    if name == "baseline":
        base = row
    else:
        rows.append(row)
rows.sort(key=lambda r: -(r["skill"] or 0))
lines = ["# DA sweep results", "",
         "| rank | experiment | skill | +6h skill | +24h skill | ACC | Δ vs baseline |",
         "|---|---|---|---|---|---|---|"]
def pct(v):
    return f"{v*100:.2f}%" if v is not None else "—"
if base:
    lines.append(f"| — | baseline | {pct(base['skill'])} | {pct(base['h6'])} "
                 f"| {pct(base['h24'])} | {base['acc']:.4f} | — |")
for i, r in enumerate(rows, 1):
    delta = (r["skill"] - base["skill"]) * 100 if base else 0.0
    lines.append(f"| {i} | {r['name']} | {pct(r['skill'])} | {pct(r['h6'])} "
                 f"| {pct(r['h24'])} | {r['acc']:.4f} | {delta:+.2f} pp |")
table = "\n".join(lines)
print(table)
with open(os.path.join(out, "DA_RESULTS.md"), "w") as f:
    f.write(table + "\n")
print(f"\n-> {os.path.join(out, 'DA_RESULTS.md')}")
PY
