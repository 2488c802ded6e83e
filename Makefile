# GEMMA-TPU build/test targets (reference Makefile analogue)

PYTHON ?= python

all: native

native:
	$(MAKE) -C native

check:
	$(PYTHON) -m pytest tests/ -x -q

fast-check:
	$(PYTHON) -m pytest tests/ -x -q -m "not slow" -k "not e2e"

bench:
	$(PYTHON) bench.py

clean:
	$(MAKE) -C native clean

.PHONY: all native check fast-check bench clean
