# Top-level targets (reference parity: /root/reference/Makefile).

.PHONY: all native test bench suite clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

suite:
	python -m benchmarks.suite --engine native
	python -m benchmarks.suite --engine tpu

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
