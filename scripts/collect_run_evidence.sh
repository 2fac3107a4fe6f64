#!/bin/bash
# Curate a training run dir into docs/runs/<tag>/ (the committed evidence
# pack — raw run dirs are gitignored; TRAINING_RUN*.md references these).
# Usage: bash scripts/collect_run_evidence.sh RUN_DIR docs/runs/r5
set -eu
RUN=$1; OUT=$2
mkdir -p "$OUT"
cp "$RUN"/stats.jsonl "$RUN"/training_options.json "$OUT"/
cp "$RUN"/reals.png "$OUT"/ 2>/dev/null || true
# first + last of each grid family
for fam in fakes parsing tryon_grid; do
  first=$(ls "$RUN"/${fam}*.png 2>/dev/null | head -1)
  last=$(ls "$RUN"/${fam}*.png 2>/dev/null | tail -1)
  [ -n "$first" ] && cp "$first" "$OUT"/
  [ -n "$last" ] && cp "$last" "$OUT"/
done
python scripts/plot_training_curves.py "$RUN" "$OUT"/curves.png
echo "collected into $OUT:"; ls "$OUT"
