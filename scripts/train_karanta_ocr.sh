#!/usr/bin/env bash
# OCR VLM fine-tune launcher (reference scripts/train_karanta_ocr.sh).
# On a TPU pod slice, run this once per host; jax.distributed picks up the
# topology from the TPU runtime (no NCCL env needed — collectives ride ICI).
set -euo pipefail

CONFIG=${1:-configs/training/ocr/karanta_qwen25_3b.yaml}
shift || true

LOG_DIR=${LOG_DIR:-logs}
mkdir -p "$LOG_DIR"
STAMP=$(date +%Y%m%d_%H%M%S)

nohup python -m karanta_tpu.training.train "$CONFIG" "$@" \
    > "$LOG_DIR/train_$STAMP.log" 2>&1 &
echo "training started (pid $!) — log: $LOG_DIR/train_$STAMP.log"
