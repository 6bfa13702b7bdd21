#!/usr/bin/env bash
# Thin wrapper (reference scripts/convert_pdf_2_image.sh).
set -euo pipefail
exec python -m karanta_tpu.data.convert_pdf_2_image "$@"
