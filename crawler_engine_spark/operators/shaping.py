"""Output shaping (M5): the deterministic subset of the reference's
``format_to_schema`` (utils/ai_client.py:674-850).

The reference's schema shaping is AI-backed; its deterministic behaviours
(those that survive an AI failure, plus the pure template path) are:
* ``output_format`` is a ``{placeholder}`` template → ``SafeDict`` rendering:
  missing keys stay as literal ``{key}`` (ai_client.py:788-813)
* ``output_format`` is the literal ``"string"``/``"raw"``/None → raw content
* anything else on the deterministic path → fallback = raw content
  (ai_client.py catch-all)

Plus the CLI save formats (cli.py:468-486): json / markdown / text / html
per-result renderings.

All shaping is pure column expressions or a tiny per-row kernel over
already-extracted fields — no AI, no network.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_PLACEHOLDER_RE = re.compile(r"\{(\w+)\}")


class SafeDict(dict):
    """format_map dict that leaves unknown placeholders intact
    (ai_client.py SafeDict semantics)."""

    def __missing__(self, key: str) -> str:
        return "{" + key + "}"


def render_template(template: str, fields: dict) -> str:
    return template.format_map(SafeDict(fields))


def render_template_col(template: str, result: DataFrame) -> Column:
    """Template rendering as a pure column expression: each ``{name}``
    placeholder that names a column becomes that column (nulls → literal
    placeholder), others stay literal.  JVM-side — the scale path."""
    cols = set(result.columns)
    parts = []
    pos = 0
    for m in _PLACEHOLDER_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        if name in cols:
            parts.append(
                F.coalesce(F.col(name).cast("string"), F.lit("{" + name + "}"))
            )
        else:
            parts.append(F.lit(m.group(0)))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def schema_struct_col(schema: dict, result: DataFrame) -> Column:
    """Deterministic dict-schema projection (the no-AI realization of the
    reference's object-schema path, ai_client.py:736-758): each schema key
    is filled from the like-named extracted column, cast per the declared
    type (``string`` / ``number`` / ``list``); nested dict values recurse;
    keys with no matching column become typed nulls — 'fill missing fields
    with best-effort from the content' without a model call."""
    cols = set(result.columns)
    fields = []
    for key, typ in schema.items():
        if isinstance(typ, dict):
            fields.append(schema_struct_col(typ, result).alias(key))
            continue
        if key in cols:
            c = F.col(key)
            if typ == "number":
                c = c.cast("double")
            elif typ == "string":
                c = c.cast("string")
            fields.append(c.alias(key))
        else:
            null_type = "double" if typ == "number" else (
                "array<string>" if typ == "list" else "string"
            )
            fields.append(F.lit(None).cast(null_type).alias(key))
    return F.struct(*fields)


def shape_results(result: DataFrame, output_format=None) -> DataFrame:
    """Apply the deterministic format_to_schema subset to an extraction
    result DataFrame; adds a ``formatted_data`` column."""
    if output_format is None or output_format in ("string", "raw"):
        return result.withColumn("formatted_data", F.col("content"))
    if isinstance(output_format, dict):
        # JSON object matching the schema, key order preserved; nulls kept
        # so the object always carries exactly the schema's keys.
        return result.withColumn(
            "formatted_data",
            F.to_json(
                schema_struct_col(output_format, result),
                {"ignoreNullFields": "false"},
            ),
        )
    if isinstance(output_format, list) and len(output_format) == 1 and isinstance(
        output_format[0], dict
    ):
        # [schema] → JSON array (reference list-schema intent); the
        # deterministic subset emits the per-page projection as a
        # one-element array.
        return result.withColumn(
            "formatted_data",
            F.to_json(
                F.array(schema_struct_col(output_format[0], result)),
                {"ignoreNullFields": "false"},
            ),
        )
    if isinstance(output_format, str) and _PLACEHOLDER_RE.search(output_format):
        return result.withColumn(
            "formatted_data", render_template_col(output_format, result)
        )
    # Deterministic fallback: raw content (the AI path always fails offline).
    return result.withColumn("formatted_data", F.col("content"))


# ----------------------------------------------------- LLM-output JSON
# The deterministic JSON-isolation logic of ai_client.py:697-732 (find the
# first '{' .. last '}', else a ```json fenced block; arrays additionally
# unwrap {items|data|results|list: [...]}) as pure column expressions —
# useful for post-processing stored model outputs at scale; no AI here,
# just the reference's string semantics.


def extract_json_obj_col(txt: Column) -> Column:
    """JSON-object substring of a free-text column, or null.

    Mirrors the EXECUTED ``_extract_json_obj`` semantics: the greedy
    first-'{'-to-last-'}' span if it parses as JSON, else null (a parse
    failure lands in the reference's catch-all → None).  The reference's
    fenced-```json``-block branch is unreachable in execution — it only
    runs when the text contains no '{' at all, but the fence regex itself
    requires one — so, like the other dead reference branches (SURVEY §7),
    it is not replicated."""
    greedy = F.regexp_extract(txt, r"(\{[\s\S]*\})", 1)
    cand = F.when(greedy != "", greedy)
    return F.when(F.get_json_object(cand, "$").isNotNull(), cand)


_ARR_WRAPPER_KEYS = ("items", "data", "results", "list")


def extract_json_arr_col(txt: Column) -> Column:
    """JSON-array substring, or an array unwrapped from a common wrapper
    object key (items/data/results/list) — ``_extract_json_arr`` semantics."""
    greedy = F.regexp_extract(txt, r"(\[[\s\S]*\])", 1)
    arr = F.when(
        (greedy != "") & F.get_json_object(greedy, "$").isNotNull(), greedy
    )
    obj = extract_json_obj_col(txt)
    unwrapped = F.coalesce(
        *[F.get_json_object(obj, f"$.{k}") for k in _ARR_WRAPPER_KEYS]
    )
    unwrapped = F.when(unwrapped.startswith("["), unwrapped)
    return F.coalesce(arr, unwrapped)


# ---------------------------------------------------------------- renderers
# CLI save formats (cli.py:468-486): per-row document renderings.


def render_markdown_col(result: DataFrame) -> Column:
    return F.concat(
        F.lit("# "),
        F.coalesce(F.col("title"), F.col("url")),
        F.lit("\n\n"),
        F.lit("**URL:** "), F.col("url"), F.lit("\n\n"),
        F.coalesce(F.col("content"), F.lit("")),
    )


def render_text_col(result: DataFrame) -> Column:
    return F.coalesce(F.col("content"), F.lit(""))


def render_html_col(result: DataFrame) -> Column:
    esc = lambda c: F.regexp_replace(
        F.regexp_replace(F.regexp_replace(c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"
    )
    return F.concat(
        F.lit("<html><head><title>"),
        esc(F.coalesce(F.col("title"), F.col("url"))),
        F.lit("</title></head><body><pre>"),
        esc(F.coalesce(F.col("content"), F.lit(""))),
        F.lit("</pre></body></html>"),
    )


def render_json_rows(result: DataFrame, columns: list[str] | None = None) -> DataFrame:
    cols = columns or ["url", "content", "title", "confidence_score", "success"]
    return result.select(F.to_json(F.struct(*cols)).alias("json"))
