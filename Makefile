# Developer entry points.
.PHONY: test native bench smoke dryrun check

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

# Green-suite gate: full CPU suite, NO -x (report every failure), fails
# the target on any red. Run before every snapshot/round end — the r4
# snapshot shipped 4 failing tests because the last commits skipped this.
check:
	python -m pytest tests/ -q --maxfail=0
	@echo "CHECK GREEN"

bench:
	python bench.py

smoke:
	python scripts/smoke_e2e_tpu.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	PYTHONPATH=. python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"
