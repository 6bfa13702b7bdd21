#!/usr/bin/env bash
# Serial TPU measurement sequence (single chip — avoid contention).
set -u
cd /root/repo

# wait for any running bench to exit
while pgrep -f "bench.py --pages" > /dev/null; do sleep 20; done

echo "=== bench default (b8, warms cache for driver) ==="
timeout 1200 python bench.py 2>&1 | grep -v WARNING | tail -1

echo "=== bench int8 ==="
timeout 1200 python bench.py --quantize int8 2>&1 | grep -v WARNING | tail -1

echo "=== flash sweep ==="
timeout 1200 python scripts/sweep_flash_attention.py 2>&1 | grep -v WARNING

echo "=== done ==="
