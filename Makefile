# Top-level targets (the reference drives everything through `make` too,
# Makefile:1-13 — here the engine needs no compilation, only the native
# runtime helpers do).

.PHONY: all native test bench graft verify-tpu clean

all: native

# Native ingest + checkpoint IO shared library (g++, libjpeg).
native:
	$(MAKE) -C resnetc_tpu/native

# Full test suite: CPU, 8 virtual devices (tests/conftest.py sets that up).
test:
	python -m pytest tests/ -q

# Headline benchmark (one JSON line; meaningful on TPU).
bench:
	python bench.py

# Driver entry smoke: single-chip compile check + 8-device dry run.
graft:
	python __graft_entry__.py

# Compiled-path (Mosaic) kernel parity on the real chip; writes
# VERIFY_TPU.json, exit 0 iff every kernel matches its lax oracle.
verify-tpu:
	python tools/verify_tpu.py

clean:
	$(MAKE) -C resnetc_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
