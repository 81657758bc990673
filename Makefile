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

corpus:
	python jobs/corpus_dedup.py --input /root/testdata/sf0.01 --output /tmp/ipl_corpus

pyfiles:
	cd $(CURDIR) && zip -qr /tmp/ipl_dagster_pipeline_spark.zip ipl_dagster_pipeline_spark -x '*__pycache__*'
	@echo "spark-submit --py-files /tmp/ipl_dagster_pipeline_spark.zip jobs/feature_build.py ..."
