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

run tests_q4 2400 python -m pytest tests/test_linear_q4.py tests/test_moe_q4.py tests/test_q4_lm.py -x -q
run q4_kernels 1800 python scripts/bench_q4_kernels.py
run q4_decode 1800 python scripts/bench_q4_decode.py
run tests_kernels 2400 python -m pytest tests/test_flash_attention.py tests/test_vision_parity.py tests/test_lookup_decode.py -x -q
run tests_paged_chunk 1500 python -m pytest tests/test_paged_attention.py tests/test_continuous.py::test_continuous_lookup_token_exact -x -q
run bench 3000 python bench.py
echo "ALL DONE $(date -u)" >> $log/status.txt
