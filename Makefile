# gcslam_tpu build/test/eval entry points (the reference's Makefile analog)

.PHONY: test eval bench native clean

test:
	python -m pytest tests/ -x -q

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
