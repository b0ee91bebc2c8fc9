from __future__ import annotations

import os
import shutil

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


@pytest.fixture(scope="session")
def spark():
    from clinical_trial_searchengine_spark.session import get_spark

    s = get_spark(app_name="ctse-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus_pdf():
    from clinical_trial_searchengine_spark.sources.corpus import (
        generate_corpus_pandas,
    )

    return generate_corpus_pandas(200, seed=42)


@pytest.fixture(scope="session")
def small_corpus_df(spark, small_corpus_pdf):
    return spark.createDataFrame(small_corpus_pdf)


@pytest.fixture(scope="session")
def built_index(spark, small_corpus_df, tmp_path_factory):
    """Standard-mode index over the 200-doc corpus, small shards so the
    per-shard kernel + global merge paths are genuinely exercised."""
    from clinical_trial_searchengine_spark.engine import SearchEngine

    d = str(tmp_path_factory.mktemp("idx") / "standard")
    eng = SearchEngine(spark, d)
    eng.build(
        small_corpus_df,
        mode="standard",
        shard_size=48,
        hot_df_threshold=40,
        max_salts=4,
        n_resume_groups=2,
        norm_chunk=16,
    )
    yield eng
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def built_index_porter(spark, small_corpus_df, tmp_path_factory):
    from clinical_trial_searchengine_spark.engine import SearchEngine

    d = str(tmp_path_factory.mktemp("idxp") / "porter")
    eng = SearchEngine(spark, d)
    eng.build(
        small_corpus_df,
        mode="porter",
        shard_size=64,
        hot_df_threshold=40,
        max_salts=4,
        n_resume_groups=1,
    )
    yield eng
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
