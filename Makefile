# Convenience targets (the reference's CMake role; see native/Makefile for
# the C++ runtime build and pyproject.toml for packaging).

PY ?= python
CPU_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

.PHONY: test native bench bench-all oracle-table clean

native:
	$(MAKE) -C native

test: native
	$(CPU_ENV) $(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

bench-all:
	$(PY) benchmarks/run_benchmarks.py

oracle-table:
	$(CPU_ENV) $(PY) benchmarks/compare_oracles.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
