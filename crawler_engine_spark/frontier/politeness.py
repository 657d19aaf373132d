"""Per-host politeness scheduler: robots filtering + budgeted batch selection.

Realizes the reference's global rate limits (requests_per_second=2.0,
delay_between_requests=0.5 s, models/config.py:158-161) as a *per-host
per-round budget* — the distributed analog of its asyncio semaphores
(core/extractor.py:290-296) — plus robots.txt handling the reference lacks
(north-rule requirement).

Skew handling (explicit, per north rule): host popularity is Zipf-skewed, so
a single window over ``host`` would straggle on hot hosts.  Selection is
two-phase salted:

  phase 1  window over (host, salt = pmod(url_hash, S)): row_number ≤ budget
           — each hot host's ranking work spreads over S reducers; survivors
           are ≤ S × budget per host.
  phase 2  window over host on the ≤ S×budget survivors: row_number ≤ budget
           — exact top-k per host, tiny input.

The selected set is *identical* to a single-phase top-k (phase 1 never drops
a row that phase 2 would keep: a row in the host's true top-budget is within
its salt's top-budget a fortiori), so ordering parity with the oracle
simulator is preserved while the shuffle skew is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import caches

DEFAULT_REQUESTS_PER_SECOND = 2.0  # models/config.py:159
DEFAULT_CRAWL_DELAY_S = 0.5        # models/config.py:161
DEFAULT_ROUND_SECONDS = 10.0
DEFAULT_NUM_SALTS = 8

PRIORITY_COLS = ["depth", "parent_seq", "link_position"]


def apply_robots(
    frontier: DataFrame,
    robots: DataFrame,
    round_seconds: float = DEFAULT_ROUND_SECONDS,
    host_tokens: DataFrame | None = None,
    burst_rounds: int = 1,
) -> DataFrame:
    """Broadcast-join robots rules + token-bucket state; adds ``allowed``,
    ``host_budget`` and ``tokens_available``.

    Token bucket per host: refill = round_seconds / crawl_delay tokens per
    round, capacity = burst_rounds × refill; budget = max(1, floor(available))
    (the ≥1 floor can drive tokens negative — legitimate bucket debt that
    shrinks the next round's budget).  With burst_rounds=1 the carried state
    cannot exceed one refill, so budgets equal the stateless per-round
    formula.  ``robots`` columns: host, disallow_prefixes, crawl_delay_s;
    hosts without a rule default to allowed at the reference delay
    (models/config.py:161).  ``host_tokens`` columns: host, tokens.
    """
    joined = frontier.join(F.broadcast(robots), on="host", how="left")
    if host_tokens is not None:
        joined = joined.join(F.broadcast(host_tokens), on="host", how="left")
        tokens = F.coalesce(F.col("tokens"), F.lit(0.0))
    else:
        tokens = F.lit(0.0)
    disallowed = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: F.col("path").startswith(p),
    )
    delay = F.coalesce(F.col("crawl_delay_s"), F.lit(DEFAULT_CRAWL_DELAY_S))
    refill = F.lit(round_seconds) / F.greatest(delay, F.lit(1e-9))
    available = F.least(F.lit(float(burst_rounds)) * refill, tokens + refill)
    out = (
        joined.withColumn("allowed", ~disallowed)
        .withColumn("tokens_available", available)
        .withColumn(
            "host_budget",
            F.greatest(F.lit(1), F.floor(available)).cast("int"),
        )
        .drop("disallow_prefixes", "crawl_delay_s")
    )
    return out.drop("tokens") if host_tokens is not None else out


def apply_host_reputation(
    frontier: DataFrame,
    reputation: DataFrame,
    min_factor: float = 0.5,
    max_factor: float = 2.0,
    default_quality: float = 0.5,
) -> DataFrame:
    """Scale each host's politeness ``host_budget`` by its corpus-quality
    reputation — the feedback loop from the corpus tier back into crawl
    scheduling (hosts whose extracted documents score well earn a larger
    per-round budget; low-quality hosts are throttled, never starved).

    ``reputation`` columns: host, avg_quality in [0,1] (the
    host_reputation rollup).  factor interpolates linearly from
    ``min_factor`` (quality 0) to ``max_factor`` (quality 1); hosts absent
    from the table use ``default_quality``.  budget' = max(1,
    floor(budget × factor)) — the ≥1 floor preserves liveness, and the
    reputation table is host-cardinality (small), so this is a broadcast
    join on top of the existing budget column, shuffle-free."""
    rep = reputation.select(
        "host", F.col("avg_quality").cast("double").alias("_q")
    )
    q = F.coalesce(F.col("_q"), F.lit(float(default_quality)))
    factor = F.lit(min_factor) + (F.lit(max_factor) - F.lit(min_factor)) * q
    return (
        frontier.join(F.broadcast(rep), on="host", how="left")
        .withColumn(
            "host_budget",
            # round to 6 decimals before flooring: IEEE doubles can land an
            # exactly-representable product (10 × 1.4 = 13.999999…) just
            # below its mathematical value and floor would undercount by 1
            F.greatest(
                F.lit(1), F.floor(F.round(F.col("host_budget") * factor, 6))
            ).cast("int"),
        )
        .drop("_q")
    )


def select_batch(
    frontier: DataFrame, num_salts: int = DEFAULT_NUM_SALTS
) -> tuple[DataFrame, DataFrame]:
    """Priority-ordered per-host batch selection (salted two-phase window).

    Input must carry: host, host_budget, url_hash, and PRIORITY_COLS.
    Returns ``(selected, remainder)`` — remainder stays in the frontier.
    """
    order = [F.col(c).asc() for c in PRIORITY_COLS] + [F.col("url_hash").asc()]

    salted = frontier.withColumn(
        "_salt", F.pmod(F.col("url_hash"), F.lit(num_salts)).cast("int")
    )
    w1 = Window.partitionBy("host", "_salt").orderBy(*order)
    phase1 = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= F.col("host_budget"))
        .drop("_r1")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    ranked = phase1.withColumn("_r2", F.row_number().over(w2))
    selected = ranked.where(F.col("_r2") <= F.col("host_budget")).drop("_r2", "_salt")

    remainder = frontier.join(
        selected.select("canonical_url"), on="canonical_url", how="left_anti"
    )
    return selected, remainder


def global_fetch_sequence(selected: DataFrame, offset: int = 0) -> DataFrame:
    """Assign a deterministic global ``fetch_seq`` by total priority order
    WITHOUT a single-partition window: range-repartition by the sort key,
    per-partition row_number, plus per-partition offsets.

    The offsets are NOT collected to the driver and baked into the plan
    as a literal map — a re-evaluation of the range shuffle samples new
    boundaries, and a fresh layout paired with a stale literal map would
    silently corrupt the sequence (duplicate / gapped fetch_seq).
    Instead the cumulative-offset map is derived from the SAME cached
    ``arranged`` projection inside the one query: a tiny
    count-per-partition aggregate folded into a single-row
    ``map<pid, offset>`` (``F.aggregate`` over the sorted counts) that is
    broadcast back over a 1×N cross join.  The cache is the sharing
    point: both branches scan one ``InMemoryRelation``, so they see one
    buffers RDD — while cached, after an executor loss (recompute reuses
    the range partitioner already baked into the RDD), and even after a
    registry drain (the relation rebuilds its RDD once and both branches
    read the rebuild).  Offsets and row numbers therefore always describe
    the same layout; any evaluation is self-consistent, which is the
    recompute-safety the cache registry's "drain at any point" contract
    assumes (value-locked in tests/test_plans.py).  Exchange-level reuse
    alone would NOT give this: column pruning narrows the counts branch,
    so the two range exchanges differ and ``ReusedExchange`` cannot
    match them.

    The arranged cache is registered in the session registry — the
    engine drains it at each round commit, otherwise one batch-sized
    cache per round would outlive its round.  The single-partition
    exchange introduced by the offset fold carries ≤ n_part count rows
    (metadata, not data); the row_number window stays partitioned by
    ``_pid``.
    """
    order_cols = PRIORITY_COLS + ["url_hash"]
    n_part = max(selected.sparkSession.sparkContext.defaultParallelism, 1)
    arranged = (
        selected.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    ).cache()
    caches.register(arranged)
    counts = arranged.groupBy("_pid").agg(F.count("*").alias("_n"))
    offset_map = counts.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("_pid", "_n"))),
            F.struct(
                F.lit(offset).cast("long").alias("acc"),
                F.create_map().cast("map<int,bigint>").alias("m"),
            ),
            lambda s, x: F.struct(
                (s["acc"] + x["_n"]).alias("acc"),
                F.map_concat(s["m"], F.create_map(x["_pid"], s["acc"])).alias("m"),
            ),
            lambda s: s["m"],
        ).alias("_om")
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        arranged.crossJoin(F.broadcast(offset_map))
        .withColumn(
            "fetch_seq",
            (F.row_number().over(w) - 1 + F.col("_om")[F.col("_pid")]).cast("long"),
        )
        .drop("_pid", "_om")
    )
