#!/usr/bin/env bash
# Ground-truth generation at scale (reference scripts/groundtruth_vllm.sh):
# build teacher request files from sampled PDFs, then fan them out across
# the inference-server fleet with the bulk dispatcher.
#
# Usage: ./scripts/groundtruth_bulk.sh <pdf_dir> <work_dir> [ports...]
set -euo pipefail

PDF_DIR=${1:?usage: $0 <pdf_dir> <work_dir> [ports...]}
WORK=${2:?usage: $0 <pdf_dir> <work_dir> [ports...]}
shift 2
PORTS=${*:-30024}

python -m karanta_tpu.data.create_batch_data_prompts \
    --pdf_dir "$PDF_DIR" --output_dir "$WORK/requests" \
    --model karanta-ocr --flavor vllm

SERVERS=()
for PORT in $PORTS; do SERVERS+=("http://localhost:$PORT"); done
exec python -m karanta_tpu.bulk.main \
    --input "$WORK/requests" --output "$WORK/results" \
    --servers "${SERVERS[@]}"
