#!/bin/bash
# Chip benchmark sweep (serialized — concurrent chip jobs corrupt timing).
# Covers: BASELINE config matrix, guarantee engines, 10k-channel scale,
# both DSD directions, and the on-chip accuracy audit backing the
# -141 dB claims.  Results land in the README/BASELINE.md tables.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/bench_sweep.log}
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  "$@" 2>&1 | grep -vE 'WARNING|warn' | tail -2 | tee -a "$LOG"
}

# --- BASELINE matrix (fast + high on each config) -----------------------
run timeout 1800 python bench.py
run env R8B_BENCH_PRECISION=high timeout 1800 python bench.py
run env R8B_BENCH_SRC=96000 R8B_BENCH_DST=44100 timeout 1800 python bench.py
run env R8B_BENCH_SRC=96000 R8B_BENCH_DST=44100 R8B_BENCH_PRECISION=high timeout 1800 python bench.py
run env R8B_BENCH_SRC=44100 R8B_BENCH_DST=48000 timeout 1800 python bench.py
run env R8B_BENCH_SRC=44100 R8B_BENCH_DST=48000 R8B_BENCH_PRECISION=high timeout 1800 python bench.py
run env R8B_BENCH_SRC=44100 R8B_BENCH_DST=96001 timeout 1800 python bench.py
run env R8B_BENCH_SRC=44100 R8B_BENCH_DST=96001 R8B_BENCH_PRECISION=high timeout 1800 python bench.py

# --- DSD, both directions (Mrops counts INPUT samples: the 64x up
# direction reads low even when output throughput is ~13 G samples/s) ---
run env R8B_BENCH_SRC=2822400 R8B_BENCH_DST=96000 R8B_BENCH_ATTEN=150 R8B_BENCH_CHANNELS=64 R8B_BENCH_SECONDS=0.25 R8B_BENCH_METRIC=dsd64_to_96k_throughput timeout 2400 python bench.py
run env R8B_BENCH_SRC=44100 R8B_BENCH_DST=2822400 R8B_BENCH_ATTEN=150 R8B_BENCH_CHANNELS=64 R8B_BENCH_SECONDS=0.25 R8B_BENCH_METRIC=pcm_to_dsd64_throughput timeout 2400 python bench.py

# --- guarantee engines (backend-independent -141 dB class) --------------
run env R8B_BENCH_PRECISION=high R8B_BENCH_FUSED=0 R8B_BENCH_ENGINE=pallas_fft5 R8B_BENCH_METRIC=hp_dfft5_guarantee timeout 2400 python bench.py
run env R8B_BENCH_PRECISION=high R8B_BENCH_FUSED=0 R8B_BENCH_ENGINE=pallas_fft4 R8B_BENCH_METRIC=hp_dfft4_guarantee timeout 2400 python bench.py

# --- precision presets (CDSPResampler16/16IR/24 + default atten) --------
run env R8B_BENCH_ATTEN=136.45 timeout 1800 python bench.py
run env R8B_BENCH_ATTEN=109.56 timeout 1800 python bench.py
run env R8B_BENCH_ATTEN=206.91 timeout 1800 python bench.py

# --- 10k-channel scale ---------------------------------------------------
run env R8B_BENCH_CHANNELS=10240 R8B_BENCH_ITERS=4 R8B_BENCH_METRIC=fast_10k_channels timeout 2400 python bench.py

# --- on-chip accuracy audit ----------------------------------------------
run timeout 3600 python tools/chip_accuracy.py --configs fast,high,high_toeplitz,hp_dfft_pallas5,hp_dfft_pallas4
run timeout 1800 python tools/chip_accuracy.py --src 44100 --dst 96001 --configs fast,high
run timeout 2400 python tools/chip_accuracy.py --src 2822400 --dst 96000 --atten 150 --seconds 0.25 --channels 2 --configs fast

echo "ALL DONE" | tee -a "$LOG"
