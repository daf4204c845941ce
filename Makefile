# Convenience targets (the reference's Makefile equivalent, Makefile:1-25;
# there is no codegen step — JAX compiles at runtime into .jax_cache).

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C csrc

test:
	python -m pytest tests/ -q

bench:
	python bench.py 10

clean:
	$(MAKE) -C csrc clean
	rm -rf .jax_cache __pycache__
