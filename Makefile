# Developer entry points.
.PHONY: test native bench smoke dryrun

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

smoke:
	python scripts/smoke_e2e_tpu.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	PYTHONPATH=. python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
