# devias_tpu developer entry points
.PHONY: install native test test-fast bench dryrun clean

install:
	pip install -e . --no-deps --no-build-isolation

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_cli_smoke.py --ignore=tests/test_real_video_e2e.py

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "\
	import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean

check-tpu:
	python scripts/tpu_kernel_parity.py

overfit-check:
	python scripts/full_scale_overfit.py

health-check:
	python scripts/health_run.py
