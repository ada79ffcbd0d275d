# gcslam_tpu build/test/eval entry points (the reference's Makefile analog)

.PHONY: test eval bench native clean

# PALLAS_AXON_POOL_IPS is cleared so the axon sitecustomize does not dial
# the remote-TPU relay: tests run on the virtual CPU mesh (tests/conftest.py)
# and the relay register() call deadlocks on a futex whenever another
# process (bench, profiler) holds the chip — tests must not serialize
# behind TPU work.
test:
	env PALLAS_AXON_POOL_IPS= python -m pytest tests/ -x -q

# the single test path (reference: make eval -> run_and_evaluate_gc.sh)
eval:
	python -m gcslam_tpu.eval.run --scans 160 --out results/latest
	python -m gcslam_tpu.eval.audit results/latest

bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	rm -rf results
