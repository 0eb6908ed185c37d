.PHONY: test test-full test-fast bench lowering-check multichip-dryrun

# Default CI gate: everything EXCEPT the slow statistical batteries
# (marked `slow`; see tests/conftest.py) — keeps a sub-5-minute wall on
# the 1-core CPU host.
test:
	python -m pytest tests/ -q

# Weekly-depth run: the full suite including the statistical batteries
# (oracle parity, accuracy floors, fuzzing, multi-process smoke).
test-full:
	python -m pytest tests/ -q --runslow

# Quick signal: API + fast-path + kernel differential tests only.
test-fast:
	python -m pytest tests/test_api.py tests/test_fast_warp.py \
	  tests/test_tpu_lowering.py -q

# One-line JSON perf record (runs on the real TPU when reachable;
# fails fast with an explicit record when the device is down).
bench:
	python bench.py

# TPU Mosaic lowering of every Pallas kernel without hardware.
lowering-check:
	python -m pytest tests/test_tpu_lowering.py -q

# 8-virtual-device sharded train/predict dry run.
multichip-dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
