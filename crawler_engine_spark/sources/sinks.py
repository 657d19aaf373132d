"""Result sinks (S4/S5): write extraction results as parquet / json / text
renderings, partitioned per round — the distributed analog of the
reference's per-result file saves (models/extraction_result.py:286-289,
cli.py:468-496).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators import shaping


def write_results(
    result: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """fmt ∈ {parquet, json, markdown, text, html}.  Non-parquet formats
    write one rendered document per row via the text datasource."""
    if fmt == "parquet":
        out, datasource = result, "parquet"
    elif fmt == "json":
        out = shaping.render_json_rows(result).withColumnRenamed("json", "value")
        datasource = "text"
    elif fmt == "markdown":
        out = result.select(shaping.render_markdown_col(result).alias("value"))
        datasource = "text"
    elif fmt == "text":
        out = result.select(shaping.render_text_col(result).alias("value"))
        datasource = "text"
    elif fmt == "html":
        out = result.select(shaping.render_html_col(result).alias("value"))
        datasource = "text"
    else:
        raise ValueError(f"unknown sink format: {fmt}")
    writer = out.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.mode(mode).format(datasource).save(path)


def read_pages(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """Pages source: parquet (default) or json lines with the input_hint
    schema (url, warc_ts, html, text, lang)."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        df = spark.read.json(path)
        if "html" in df.columns:
            df = df.withColumn("html", F.col("html").cast("binary"))
        return df
    raise ValueError(f"unknown pages format: {fmt}")
