"""Spark-level extraction operator tests: the mapInPandas kernel output must
equal the pure-Python kernel row-for-row, and the JVM-side URL column
expressions must agree with the parity UDFs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_engine_spark.data import gen
from crawler_engine_spark.data.gen import gen_pages_df
from crawler_engine_spark.kernels import urls as urlkit
from crawler_engine_spark.kernels.extract import extract_page
from crawler_engine_spark.operators import urlops
from crawler_engine_spark.operators.extraction import extract_pages

N = 80


@pytest.fixture(scope="module")
def pages(spark):
    return gen_pages_df(spark, N, partitions=4).cache()


def test_extraction_matches_kernel_bytes(spark, pages):
    """Byte-identical `content` per url: Spark operator vs pure kernel."""
    rows = (
        extract_pages(pages, mode="adaptive")
        .select("url", "content", "confidence_score", "out_links")
        .collect()
    )
    assert len(rows) == N
    by_url = {r["url"]: r for r in rows}
    for doc_id in range(N):
        url = gen.url_of(doc_id)
        expected = extract_page(url, gen.html_of(doc_id, N), None, "adaptive")
        got = by_url[url]
        assert got["content"].encode() == expected["content"].encode()
        assert got["out_links"] == expected["out_links"]


def test_extraction_all_modes_schema(spark, pages):
    for mode in ["semantic", "structured", "rule_based", "hybrid"]:
        df = extract_pages(pages.limit(10), mode=mode)
        rows = df.collect()
        assert len(rows) == 10
        assert all(r["mode"] == mode for r in rows)


def test_per_row_mode_and_query_columns(spark, pages):
    withcols = pages.limit(6).withColumn(
        "mode", F.lit("structured")
    ).withColumn("query", F.lit("spark"))
    rows = extract_pages(withcols).collect()
    assert all(r["mode"] == "structured" for r in rows)


def test_extraction_plan_is_shuffle_free(spark, pages):
    plan = extract_pages(pages, mode="adaptive")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow op: upstream partitioning preserved


def test_urlops_columns_agree_with_kernel(spark):
    urls = [
        "https://host1.example/news/doc5?utm=1#frag",
        "  example.com/x ",
        "https://User@Host9.Example:444/a/b;p",
        "https://host0.example/a//b/",
        "HTTPS://UPPER.example/Q",
        "https://host.example",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    got = df.select(
        urlops.canonical_url_col(F.col("url")).alias("canon"),
        urlops.host_col(urlops.canonical_url_col(F.col("url"))).alias("host"),
    ).collect()
    for raw, row in zip(urls, got):
        assert row["canon"] == urlkit.canonicalize_url(raw), raw
        assert row["host"] == urlkit.url_host(urlkit.canonicalize_url(raw)), raw
