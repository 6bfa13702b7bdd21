#!/usr/bin/env bash
# Inference server fleet launcher (replaces the reference's
# scripts/start_multiple_vllm_servers.sh): one karanta-tpu server per
# TPU-chip/port pair, health-polled, PID files + generated cleanup script,
# server_summary.json.
#
# Usage: ./scripts/start_inference_servers.sh -p "30024 30025" \
#            -m /ckpts/qwen25-vl-3b [-b max_batch] [-l max_model_len]
set -euo pipefail

PORTS="30024"
MODEL_PATH=""
PRESET=""
MAX_BATCH=8
MAX_LEN=8192
RUN_DIR=${RUN_DIR:-runs/servers}

while getopts "p:m:P:b:l:" opt; do
  case $opt in
    p) PORTS=$OPTARG ;;
    m) MODEL_PATH=$OPTARG ;;
    P) PRESET=$OPTARG ;;
    b) MAX_BATCH=$OPTARG ;;
    l) MAX_LEN=$OPTARG ;;
    *) echo "usage: $0 -p \"port...\" [-m model_path] [-P preset]"; exit 1 ;;
  esac
done

mkdir -p "$RUN_DIR"
CLEANUP="$RUN_DIR/stop_servers.sh"
echo "#!/usr/bin/env bash" > "$CLEANUP"
chmod +x "$CLEANUP"
SUMMARY="$RUN_DIR/server_summary.json"
echo "[" > "$SUMMARY"

FIRST=1
CHIP=0
for PORT in $PORTS; do
  ARGS=(--port "$PORT" --max-batch-size "$MAX_BATCH" --max-model-len "$MAX_LEN")
  [ -n "$MODEL_PATH" ] && ARGS+=(--model-path "$MODEL_PATH")
  [ -n "$PRESET" ] && ARGS+=(--preset "$PRESET")
  LOG="$RUN_DIR/server_$PORT.log"
  # pin one chip per server when multiple chips are visible
  TPU_VISIBLE_CHIPS=$CHIP nohup python -m karanta_tpu.inference.server \
      "${ARGS[@]}" > "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > "$RUN_DIR/server_$PORT.pid"
  echo "kill $PID 2>/dev/null || true" >> "$CLEANUP"

  # health poll (the reference polls /health the same way)
  for _ in $(seq 1 300); do
    if curl -sf "http://localhost:$PORT/health" > /dev/null 2>&1; then
      echo "server on :$PORT healthy (pid $PID)"
      break
    fi
    sleep 1
  done

  [ $FIRST -eq 0 ] && echo "," >> "$SUMMARY"
  FIRST=0
  echo "  {\"port\": $PORT, \"pid\": $PID, \"chip\": $CHIP, \"log\": \"$LOG\"}" >> "$SUMMARY"
  CHIP=$((CHIP + 1))
done
echo "]" >> "$SUMMARY"
echo "fleet summary: $SUMMARY — stop with $CLEANUP"
