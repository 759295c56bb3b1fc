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

run tests_kernels 2400 python -m pytest tests/test_flash_attention.py tests/test_vision_parity.py tests/test_lookup_decode.py -x -q
run tests_relwin 1800 env DEEPSEEK_SAM_WIN_KERNEL=1 python -m pytest tests/test_flash_attention.py tests/test_vision_parity.py -x -q
run sam_phases_base 1200 python scripts/bench_sam_phases.py
run sam_phases_relwin 1200 env DEEPSEEK_SAM_WIN_KERNEL=1 python scripts/bench_sam_phases.py
run sam_ablate 1500 python scripts/bench_sam_ablate.py
run gmm_bm 1500 python scripts/bench_gmm_bm.py
run tests_paged_chunk 1500 python -m pytest tests/test_paged_attention.py tests/test_continuous.py::test_continuous_lookup_token_exact -x -q
run lookup_decode 1800 python scripts/bench_lookup_decode.py
run continuous_lookup 1800 python scripts/bench_continuous_lookup.py
run bench 3000 python bench.py
echo "ALL DONE $(date -u)" >> $log/status.txt
