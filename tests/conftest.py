from __future__ import annotations

import pandas as pd
import pytest

from ipl_dagster_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ipl-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def small_transcripts(spark):
    """Deterministic synthetic transcripts with ties, gaps, nulls, and a hot key."""
    from ipl_dagster_pipeline_spark.sources.transcripts import synthesize_transcripts

    df = synthesize_transcripts(
        spark, n_convs=20, turns_per_conv=30, seed=7, hot_conv_fraction=0.05, hot_multiplier=10
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def small_transcripts_pdf(small_transcripts) -> pd.DataFrame:
    return small_transcripts.toPandas()


@pytest.fixture(scope="session")
def small_tool_dim(spark):
    from ipl_dagster_pipeline_spark.sources.transcripts import synthesize_tool_dim

    df = synthesize_tool_dim(spark, seed=7, n_days=40).cache()
    df.count()
    return df
