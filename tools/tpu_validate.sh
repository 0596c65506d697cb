#!/bin/bash
# On-chip validation for changes that could not be chip-checked in-session
# (run when the relay is healthy; ONE TPU process at a time).
#
#   bash tools/tpu_validate.sh
#
# Runs, in order:
#   1. a 60 s relay health probe (fails fast if the relay is wedged),
#   2. the TPU smoke suite (12 tests incl. the 1M-cloud keep-mask == f64
#      KD-tree oracle, the on-chip ICP regression, the range-split
#      equivalences and the cross-cloud NN oracle),
#   3. bench.py (headline chain; prints the JSON line).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

echo "== relay health probe"
if ! timeout 90 python -c "import jax; print('devices:', jax.devices())"; then
  echo "tpu_validate: relay unavailable (jax.devices() did not return in 90s)"
  exit 3
fi

echo "== TPU smoke suite"
if ! timeout 2400 python -m pytest tests/test_tpu_smoke.py -q; then
  echo "tpu_validate: smoke suite FAILED"
  exit 1
fi

echo "== headline bench"
timeout 3000 python bench.py
