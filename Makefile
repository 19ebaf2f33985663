# Top-level targets (reference: root/image/PCA Makefiles + POD CMake).

.PHONY: test native bench profile oracle clean

test:
	./run_tests.sh -q

native:
	$(MAKE) -C rsvd_kamaneh_raganato_terrana_tpu/native

bench:
	python bench.py

# XLA profiler trace of the headline rSVD (reference: make profile -> gprof)
profile:
	python tools/profile_rsvd.py

oracle:
	python tools/oracle_run.py --op rsvd --input data/input
	python tools/compare.py --op rsvd

clean:
	$(MAKE) -C rsvd_kamaneh_raganato_terrana_tpu/native clean
	rm -rf data/output results .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
