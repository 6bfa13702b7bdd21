#!/usr/bin/env bash
# Stratified page sampling (reference scripts/sample_dataset.sh; the module it
# called was dangling upstream — karanta_tpu/data/sampler.py is the real one).
set -euo pipefail
exec python -m karanta_tpu.data.sampler "$@"
