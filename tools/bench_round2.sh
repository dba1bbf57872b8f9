#!/bin/bash
# Round-2 chip benchmark sweep (serialized; run AFTER the headline A/B).
# Covers: BASELINE config matrix (VERDICT item 4), pallas fused A/B
# (item 5), 10k-channel scale (item 6), poly-mode throughput (item 9),
# and the on-chip accuracy audit backing the -141 dB claims.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/bench_round2.log}
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  "$@" 2>&1 | grep -vE 'WARNING|warn' | tail -2 | tee -a "$LOG"
}

# --- BASELINE matrix (fast + high on each config) -----------------------
run env R8B_BENCH_SRC=96000 R8B_BENCH_DST=44100 timeout 1800 python bench.py
run env R8B_BENCH_SRC=96000 R8B_BENCH_DST=44100 R8B_BENCH_PRECISION=high timeout 1800 python bench.py
run env R8B_BENCH_SRC=44100 R8B_BENCH_DST=48000 timeout 1800 python bench.py
run env R8B_BENCH_SRC=44100 R8B_BENCH_DST=48000 R8B_BENCH_PRECISION=high timeout 1800 python bench.py
run env R8B_BENCH_SRC=2822400 R8B_BENCH_DST=96000 R8B_BENCH_ATTEN=150 R8B_BENCH_CHANNELS=64 R8B_BENCH_SECONDS=0.25 timeout 2400 python bench.py
run env R8B_BENCH_SRC=44100 R8B_BENCH_DST=96001 timeout 1800 python bench.py
run env R8B_BENCH_SRC=44100 R8B_BENCH_DST=96001 R8B_BENCH_PRECISION=high timeout 1800 python bench.py

# --- pallas fused A/B (item 5) ------------------------------------------
run env R8B_BENCH_FUSED=1 R8B_BENCH_ENGINE=pallas R8B_BENCH_METRIC=fast_pallas_fused timeout 2400 python bench.py
run env R8B_BENCH_PRECISION=high R8B_BENCH_FUSED=1 R8B_BENCH_ENGINE=pallas R8B_BENCH_METRIC=high_pallas_fused timeout 2400 python bench.py

# --- 10k-channel scale (item 6) -----------------------------------------
run env R8B_BENCH_CHANNELS=10240 R8B_BENCH_ITERS=4 R8B_BENCH_METRIC=fast_10k_channels timeout 2400 python bench.py

# --- on-chip accuracy audit ---------------------------------------------
run timeout 3600 python tools/chip_accuracy.py --configs fast,high,high_toeplitz,hp_dfft_pallas,hp_dfft_pallas4,fast_pallas_fused,high_pallas_fused
run timeout 1800 python tools/chip_accuracy.py --src 44100 --dst 96001 --configs fast,high

echo "ALL DONE" | tee -a "$LOG"

# --- df-FFT kernel T2 sweep ---------------------------------------------
run env R8B_BENCH_PRECISION=high R8B_BENCH_FUSED=0 R8B_BENCH_ENGINE=pallas_fft4 R8B_DFFT_T2=2 R8B_BENCH_METRIC=hp_dfft4_T2_2 timeout 2400 python bench.py
run env R8B_BENCH_PRECISION=high R8B_BENCH_FUSED=0 R8B_BENCH_ENGINE=pallas_fft4 R8B_DFFT_T2=8 R8B_BENCH_METRIC=hp_dfft4_T2_8 timeout 2400 python bench.py
