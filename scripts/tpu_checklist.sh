#!/bin/bash
# Runs once when the TPU answers. ONE TPU process at a time: strictly serial.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
log=/tmp/tpu_checklist
mkdir -p $log
echo "START $(date -u)" > $log/status.txt

run() {  # run <name> <timeout_s> <cmd...>
  name=$1; t=$2; shift 2
  echo "RUN $name $(date -u)" >> $log/status.txt
  timeout "$t" "$@" > "$log/$name.log" 2>&1
  echo "DONE $name rc=$? $(date -u)" >> $log/status.txt
}

# Canary FIRST (CLAUDE.md r4): q4 lm_head b=1 is 96 us on a healthy
# session; if the canary reads >1.3x off, micro-bench rows below are
# untrustworthy (macro runs — bench.py, bench_serve_long — stay usable).
run canary 900 python -c "
import os, sys
sys.path[:0] = ['/root/repo', '/root/repo/scripts']
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
import jax, jax.numpy as jnp, numpy as np
from _bench_util import chain, time_chain
from deepseek_ocr2_tpu.ops.linear_q4 import linear_q4, quantize_linear_q4
rng = np.random.default_rng(2)
q = quantize_linear_q4(jnp.asarray(rng.standard_normal((1280, 129280)) * 0.02, jnp.float32))
x = jnp.asarray(rng.standard_normal((1, 1280)) * 0.5, jnp.bfloat16)
t = time_chain(chain(lambda x: linear_q4(x, q)), x, iters_lo=64, iters_hi=512, reps=7)
print(f'canary lmhead b=1: {t*1e6:.1f} us (known-good ~96)')"
run tests_q4 2400 python -m pytest tests/test_linear_q4.py tests/test_moe_q4.py tests/test_q4_lm.py -x -q
run q4_kernels 1800 python scripts/bench_q4_kernels.py
run q4_decode 1800 python scripts/bench_q4_decode.py
run tests_kernels 2400 python -m pytest tests/test_flash_attention.py tests/test_vision_parity.py tests/test_lookup_decode.py -x -q
run tests_paged_chunk 1500 python -m pytest tests/test_paged_attention.py tests/test_continuous.py::test_continuous_lookup_token_exact -x -q
run tests_int8tail 1500 python -m pytest "tests/test_paged_attention.py::test_int8tail_last_page_exact_1query_and_chunk" "tests/test_continuous.py::test_continuous_int8tail_kv_pool_runs" -x -q
run decode_pieces 1800 python scripts/bench_decode_chunk_pieces.py
run serve_long 3000 python scripts/bench_serve_long.py
run moe_b8 1800 python scripts/bench_moe_b8_dispatch.py
run q4_offlo_ab 1800 python scripts/bench_q4_offlo_ab.py
run gmm_fused 1800 python scripts/bench_gmm_bm.py
run sam_glue 1800 python scripts/bench_sam_phases.py
run bench 3600 python bench.py
echo "ALL DONE $(date -u)" >> $log/status.txt
