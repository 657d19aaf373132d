"""Event-stream window operators Spark lacks as built-ins: as-of join and
gap sessionization — composed from DataFrame windows (no UDFs), one
key-shuffle each.

Both are named in the task brief as canonical "custom operators": implement
as a composition of existing DataFrame ops where semantics allow — which
they do here, so no Pandas fallback is needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """As-of join: each left row picks ``value_cols`` from the latest right
    row with the same key and ``right.ts <= left.ts`` (inclusive), null when
    no such row exists — DuckDB's ``ASOF LEFT JOIN`` semantics.

    Distributed formulation: tag and union both sides, then one window per
    key ordered by (ts, side) — right rows sort before left rows at equal
    timestamps so an update at exactly the event time applies — and
    carry values forward with ``last(ignorenulls)``.  One shuffle on the
    key, no per-key explode, no row-at-a-time Python; skewed keys ride the
    same AQE/salting story as any single-key window.

    Right rows must be unique per (key, ts) — pre-aggregate if not (ties
    would resolve nondeterministically).  The whole right row is carried as
    ONE struct, so a matched row whose value is genuinely null yields null
    (not an older value), and multi-column values always come from the same
    right row.
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} already exist on the left side — "
            "rename them before the join (the output would silently shadow "
            "the left columns otherwise)"
        )
    internal = {"_rv", "_side"} & set(left.columns)
    if internal:
        raise ValueError(f"left columns {sorted(internal)} collide with "
                         "asof_join internals — rename them")
    # a NULL right timestamp sorts NULLS FIRST and would pose as the
    # earliest update; ASOF semantics (ts >= u.ts) never match NULL
    right = right.where(F.col(ts_col).isNotNull())
    rtypes = dict(right.dtypes)
    l = left.withColumn(
        "_rv",
        F.lit(None).cast(
            "struct<" + ",".join(f"{v}:{rtypes[v]}" for v in value_cols) + ">"
        ),
    ).withColumn("_side", F.lit(1))
    r = right.select(on, ts_col, F.struct(*value_cols).alias("_rv"))
    for c in left.columns:
        if c not in (on, ts_col):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.withColumn("_side", F.lit(0)).select(*l.columns)
    u = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    out = u.where(F.col("_side") == 1)
    for v in value_cols:
        out = out.withColumn(v, F.col(f"_rv.{v}"))
    return out.drop("_rv", "_side")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap_seconds``.  Adds ``session_id``
    (1-based per user, in event-time order).  ``order_cols`` break
    timestamp ties deterministically.  One shuffle on the user key; both
    windows share the same partitioning, so the second adds no exchange.
    """
    if "session_id" in df.columns:
        raise ValueError("input already has a session_id column — rename it")
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(user_col).orderBy(*order)
    # cast-through-timestamp handles both TIMESTAMP and TIMESTAMP_NTZ inputs
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(micros).over(w)
    new_session = F.when(
        prev.isNull() | (micros - prev > int(gap_seconds) * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(new_session).over(run))


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lower_col: str,
    upper_col: str,
    bin_width: float,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Range (interval-containment) join: each point row pairs with every
    range row where ``lower <= point <= upper`` (and optional equi-keys
    match) — without the cartesian blow-up of a naive non-equi join.

    Scale shape: every range explodes into the fixed-width bins it covers,
    points map to their single bin, and the match becomes an equi-join on
    (keys, bin) + an exact containment filter.  Shuffle volume is
    |points| + |ranges|·(span/bin_width); pick bin_width near the typical
    range span so most ranges cover O(1) bins.  No duplicates are possible:
    a point lives in exactly one bin, and a range covers that bin at most
    once.
    """
    if "_bin" in points.columns or "_bin" in ranges.columns:
        raise ValueError("inputs must not carry a _bin column — rename it")
    lo_bin = F.floor(F.col(lower_col) / F.lit(bin_width)).cast("long")
    hi_bin = F.floor(F.col(upper_col) / F.lit(bin_width)).cast("long")
    r = ranges.withColumn("_bin", F.explode(F.sequence(lo_bin, hi_bin)))
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    cond = [p["_bin"] == r["_bin"]] + [p[k] == r[k] for k in keys]
    joined = p.join(r, cond)
    return (
        joined.where(
            (p[point_col] >= r[lower_col]) & (p[point_col] <= r[upper_col])
        )
        .drop(r["_bin"])
        .drop(p["_bin"])
        .drop(*[r[k] for k in keys])
    )
