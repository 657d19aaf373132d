"""Plan-quality tests: the 'cite-by-design' Catalyst properties (SURVEY §4)
verified in explain() output — pushdown, pruning, broadcast, codegen."""

import pytest
from pyspark.sql import functions as F

from crawler_engine_spark.data import gen
from crawler_engine_spark.operators import urlops
from crawler_engine_spark.operators.extraction import extract_pages


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "pages")
    gen.gen_pages_df(spark, 100, partitions=4).write.parquet(p)
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark, pages_path):
    df = spark.read.parquet(pages_path).where(F.col("lang") == "en").select("url")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_column_pruning_reaches_scan(spark, pages_path):
    """Extraction reads only (url, html): text/lang/warc_ts must be pruned."""
    df = extract_pages(spark.read.parquet(pages_path), mode="adaptive")
    plan = _plan(df)
    assert "ReadSchema: struct<url:string,html:binary>" in plan


def test_broadcast_join_for_small_dim(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    dim = spark.createDataFrame([("en", "English"), ("de", "German")], ["lang", "name"])
    plan = _plan(pages.join(F.broadcast(dim), "lang"))
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_for_url_ops(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    df = pages.select(
        urlops.canonical_url_col(F.col("url")).alias("c"),
        urlops.host_col(F.col("url")).alias("h"),
        F.xxhash64("url").alias("x"),
    )
    plan = _plan(df)
    # "*(n)" node prefixes mark whole-stage-codegen stages in the plan string
    assert "*(1)" in plan
    # no Python evaluation node anywhere in the URL hot path
    assert "Python" not in plan


def test_partial_aggregation_before_shuffle(spark, pages_path):
    """Map-side combine: HashAggregate appears below AND above the Exchange."""
    pages = spark.read.parquet(pages_path)
    plan = _plan(pages.groupBy("lang").agg(F.count("*"), F.sum(F.length("html"))))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_topk_uses_take_ordered(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    plan = _plan(pages.orderBy(F.col("warc_ts").desc()).limit(5))
    assert "TakeOrderedAndProject" in plan  # no full sort for top-k
