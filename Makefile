# r8brain_tpu top-level targets.
#
#   make test     — fast CI tier (same as the pytest default)
#   make slow     — full acceptance sweeps (620-ratio zerotest, full SNR
#                   sweep, 10x mass trials, table-regeneration verify);
#                   backs the README acceptance claims
#   make native   — build the C++ deployment engine
#   make bench    — headline chip benchmark (one JSON line)

PY ?= python

.PHONY: test slow native bench

test:
	$(PY) -m pytest tests/ -q

slow:
	$(PY) -m pytest tests/ -q -m slow

native:
	$(MAKE) -C native

bench:
	$(PY) bench.py
