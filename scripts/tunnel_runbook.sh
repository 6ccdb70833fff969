#!/bin/bash
# One-shot runbook for when the TPU tunnel returns (round-4 capture set):
#   1. int4 vs int8 on-chip A/B (scripts/bench_int4_ab.py, ~20 min:
#      corpus gen + upload dominate) -> /tmp/ab_int4.log
#   2. fresh bench headline through the served surface -> /tmp/bench_out.json
#      (bench.py now self-reports the median of 3 timing passes AND the
#      end-to-end figures: end_to_end_qps, plan_build_ms_per_query_core,
#      plan_cores_for_device_rate)
#   3. coalescer under concurrent load (round-3 verdict item 5):
#      8 x b=64 callers fusing to 256-waves -> /tmp/coalescer_out.json
#      (field of record: served_b64_concurrent_qps)
# Decision rule (NOT automated — read the A/B output): flip the auto
# default to int4 only if its dense arm beats int8 by >=15% at equal
# recall@10; the flip touches models/retrievers.py, parallel/retriever.py,
# bench.py BENCH_DENSE default, docs/kernels.md + docs/benchmarks.md.
set -u
cd /root/repo
if ! timeout 3 bash -c '</dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    echo "tunnel down — nothing to do" >&2
    exit 1
fi
echo "=== int4 A/B start $(date -u +%H:%M:%S) ==="
timeout 3600 python scripts/bench_int4_ab.py 2>&1 | tee /tmp/ab_int4.log
echo "=== bench start $(date -u +%H:%M:%S) ==="
timeout 3600 python bench.py 2>/tmp/bench_stderr.log | tee /tmp/bench_out.json
echo "--- bench diagnostics tail ---"
tail -30 /tmp/bench_stderr.log
echo "=== coalescer load start $(date -u +%H:%M:%S) ==="
timeout 3600 python scripts/bench_coalescer.py \
    2>/tmp/coalescer_stderr.log | tee /tmp/coalescer_out.json
tail -5 /tmp/coalescer_stderr.log
