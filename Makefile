.PHONY: test oracle bench scaling job

test:
	python -m pytest tests/ -x -q

oracle:
	python scripts/check_oracles.py

bench:
	python bench.py

scaling:
	python scripts/bench_scaling.py

job:
	python jobs/feature_build.py --input /root/testdata/sf0.01 --output /tmp/ipl_feature_build
