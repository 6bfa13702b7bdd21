#!/usr/bin/env bash
# Bulk OCR launcher (replaces bulk_processing/scripts/
# start_multiple_celery_workers.sh + Redis): the asyncio dispatcher shards
# request files across the server fleet directly.
set -euo pipefail

INPUT=${1:?usage: $0 <input_dir> <output_dir> [ports...]}
OUTPUT=${2:?usage: $0 <input_dir> <output_dir> [ports...]}
shift 2
PORTS=${*:-30024}

SERVERS=()
for PORT in $PORTS; do SERVERS+=("http://localhost:$PORT"); done

exec python -m karanta_tpu.bulk.main \
    --input "$INPUT" --output "$OUTPUT" --servers "${SERVERS[@]}"
