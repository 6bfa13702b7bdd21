#!/usr/bin/env bash
# Classifier training launcher (reference scripts/segment_classification.sh).
set -euo pipefail
CONFIG=${1:-configs/training/classification/segment_vit.yaml}
shift || true
exec python -m karanta_tpu.training.classifier_train "$CONFIG" "$@"
