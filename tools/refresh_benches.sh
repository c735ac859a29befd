#!/bin/bash
# One-shot TPU bench refresh: headline (default batch) + the five BASELINE
# configs. Run manually after confirming the relay is healthy
# (tpu_wait probe); logs to /tmp/refresh_benches.log. Serial — the chip is
# exclusive, and concurrent runs distort each other's timings.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
cd /root/repo
echo "=== headline bench ($(date -u +%H:%M:%S)) ==="
# Budget = tpu_wait's 2700 s outage allowance + compile + run.
timeout 5400 python bench.py
echo "=== bench_configs ($(date -u +%H:%M:%S)) ==="
timeout 7200 python tools/bench_configs.py > /dev/null
echo "=== done ($(date -u +%H:%M:%S)) ==="
