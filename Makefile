# imagefolder_tpu developer entry points

test:            ## full suite on forced CPU (8 virtual devices)
	python -m pytest tests/ -q

bench:           ## one-line throughput benchmark on the attached TPU
	python bench.py

dryrun:          ## multi-chip sharding dry run on 8 virtual CPU devices
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

entry:           ## single-chip compile check of the flagship forward
	python __graft_entry__.py

verify-zoo:      ## checkpoint verification (set CKPT=... CONFIG=...)
	python scripts/verify_zoo.py --config $(CONFIG) --ckpt $(CKPT) --strict

verify-schemas:  ## export<->import roundtrip for every zoo schema
	JAX_PLATFORMS=cpu python scripts/verify_zoo.py --all_schemas

e2e:             ## full CLI workflow demo (three workloads, procedural data)
	python scripts/e2e_pipeline.py

.PHONY: test bench dryrun entry verify-zoo verify-schemas e2e
