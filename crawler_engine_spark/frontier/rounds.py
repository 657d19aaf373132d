"""The crawl-round engine: iterative DataFrame pipelines with exact resume.

One crawl round is one DataFrame pipeline (north rule):

    frontier ─ robots broadcast-join ─ salted politeness windows ─
    fetch-simulate join against the page store ─ extraction mapInPandas ─
    (results sink, exploded out-links → canonicalize → bloom membership →
     exact anti-join → next frontier)

State is checkpointed per round under ``state_dir/rounds/round=K/`` —
frontier, results, seen-set delta (doubling as the fetched-order log),
bloom segments, and
per-partition lineage metrics — committed atomically by writing a ``_COMMIT``
marker last.  Resume = continue from the highest committed round; an
interrupted round leaves no marker and is recomputed idempotently
(overwrite-by-round-id).

Scale notes (10^10-URL design point):
* The seen set is append-only per-round deltas — no cumulative rewrite.
* The exact anti-join only processes candidates the bloom flags
  ``maybe_seen`` (no false negatives ⇒ bloom-miss rows are provably new).
* Politeness selection is salted two-phase (politeness.py) — hot hosts never
  serialize onto one reducer.
* ``fetch_seq`` assignment is a distributed ranked sequence (no global
  single-partition window).

The crawl ordering is deterministic: priority = (depth, parent_seq,
link_position) — seeds order by seed_rank, discovered links inherit their
parent's global fetch sequence and in-document link position (document order,
utils/web_utils.py:87), reproducing the reference's FIFO batch semantics
(core/batch_processor.py:103-113) under a politeness budget.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import caches
from ..kernels.extract import DEFAULT_OPTIONS, ExtractOptions
from ..operators import urlops
from ..operators.extraction import extract_pages
from . import politeness, traps
from .bloom import BloomSeenSet

FRONTIER_SCHEMA = (
    "canonical_url string, url_hash long, host string, path string, "
    "depth int, parent_seq long, link_position int, query string"
)

# Checkpoint layout version, stamped into the round-0 commit record.  Bump
# when the on-disk layout changes incompatibly (v2: seen_delta carries the
# fetched log incl. 'depth'; the v1 per-round 'fetched' dir is gone).
STATE_FORMAT_VERSION = 2


@dataclass
class CrawlConfig:
    round_seconds: float = politeness.DEFAULT_ROUND_SECONDS
    num_salts: int = politeness.DEFAULT_NUM_SALTS
    bloom_partitions: int = 32
    bloom_bits_per_segment: int = 1 << 20
    mode: Optional[str] = None  # None → adaptive (reference dispatch)
    extract_opts: ExtractOptions = DEFAULT_OPTIONS
    max_rounds: int = 100
    # Token-bucket burst capacity in units of one round's refill; 1 ≡ the
    # stateless per-round budget, >1 lets idle hosts accumulate allowance.
    burst_rounds: int = 1
    # Compact the exact seen set every N committed rounds (0 = never).  The
    # per-round deltas are kept either way (they are the fetched log /
    # resume source of truth); compaction only bounds the anti-join's read
    # fan-in on long crawls.
    compact_every: int = 0
    # Prefilter backend: 'bloom' (smaller, append-only) or 'cuckoo'
    # (deletable — enables recrawl/TTL via CuckooSeenSet.delete).  Both keep
    # the no-false-negative contract; exactness always rests on the exact
    # anti-join either way.
    seen_filter: str = "bloom"
    # Crawl-trap guard (frontier/traps.py): flag any (host, URL-template)
    # whose next-frontier distinct-URL count reaches trap_threshold and keep
    # only the trap_keep_per_pattern lowest-hash URLs from it.  0 disables —
    # the default, because the threshold is corpus-relative (10^4 is noise at
    # the 10^10 design point, a whole site at toy scale).
    trap_threshold: int = 0
    trap_keep_per_pattern: int = 100
    # Link-graph budget feedback (operators/linkrank.py): PageRank the
    # crawl's own accumulated host→host link graph each round and scale
    # every eligible host's politeness budget by its authority (0.5×–2×,
    # ≥1 liveness floor) — well-linked hosts earn throughput, obscure ones
    # are throttled, never starved.  Off by default: the signal needs ≥1
    # committed round of discovered edges before it can bite.
    link_rank_budget: bool = False
    link_rank_iterations: int = 5
    # Focused crawling: teleport the budget PageRank to the crawl's own
    # round-0 seed hosts, so "authoritative" means authoritative AS SEEN
    # FROM the seeds (topic-local), not globally — off-topic hub farms
    # discovered late earn less budget than under the uniform restart.
    link_rank_focus: bool = False
    # Re-rank cadence: recompute PageRank only when the last rank table is
    # ≥ this many rounds old, reusing the written table in between.  The
    # rank table changes slowly relative to the frontier, so at the design
    # point (10^9-edge graph) ranking every N rounds divides the feedback
    # cost by N for near-identical schedules.
    link_rank_every: int = 1


def edges_compact_live(state_dir: str) -> "tuple[int, Optional[str]]":
    """(upto_round, data_dir) of the committed edge compaction under
    ``state_dir`` — the ONE reader every consumer (engine rerank,
    ``crawl.py rank``) must go through, because it honors the rename-aside
    swap's ``.old`` fallback: between the two renames of
    :meth:`CrawlEngine.compact_host_edges` only ``edges_compact.old`` is
    complete, and a reader that only checks ``edges_compact`` would
    silently fall back to per-round deltas that retention may already have
    retired.  Returns (-1, None) when no compaction is committed."""
    final = os.path.join(state_dir, "edges_compact")
    for d in (final, final + ".old"):
        try:
            with open(os.path.join(d, "_COMPACT")) as f:
                upto = int(json.load(f)["upto_round"])
        except (OSError, ValueError, KeyError):
            continue
        data = os.path.join(d, "data")
        if os.path.isdir(data):
            return upto, data
    return -1, None


class CrawlEngine:
    """Round-based distributed crawler over a static page store
    (fetch-simulate: ``page.goto(url)`` becomes a join against the Iceberg/
    parquet pages table, browser_manager.py:403-412)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        pages_path: str,
        robots: DataFrame,
        config: CrawlConfig = CrawlConfig(),
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.pages_path = pages_path
        self.robots = robots
        self.cfg = config
        if config.seen_filter == "cuckoo":
            from .cuckoo import CuckooSeenSet

            # round the bloom-sizing knob down to the cuckoo backend's
            # power-of-two bucket requirement (any CRAWL_BLOOM_BITS value
            # stays valid for either backend)
            raw = max(config.bloom_bits_per_segment // 64, 4)
            self.bloom = CuckooSeenSet(
                num_partitions=config.bloom_partitions,
                buckets_per_segment=1 << (raw.bit_length() - 1),
            )
        else:
            self.bloom = BloomSeenSet(
                num_partitions=config.bloom_partitions,
                bits_per_segment=config.bloom_bits_per_segment,
            )
        self._check_state_format()

    def _check_state_format(self) -> None:
        """Fail fast when resuming a state_dir written by an incompatible
        checkpoint layout (e.g. the pre-v2 layout with a separate 'fetched'
        dir and no 'depth' column in seen_delta) instead of mis-reading it."""
        if self.last_committed() < 0:
            return
        rec = self._read_commit(0)
        found = rec.get("format_version")
        if found != STATE_FORMAT_VERSION:
            raise RuntimeError(
                f"state_dir {self.state_dir!r} uses checkpoint format "
                f"{found!r}; this engine reads format {STATE_FORMAT_VERSION}. "
                "Re-crawl into a fresh state_dir (cross-version resume is "
                "not supported)."
            )

    # ------------------------------------------------------------- layout
    def _round_dir(self, k: int) -> str:
        return os.path.join(self.state_dir, "rounds", f"round={k}")

    def _commit_path(self, k: int) -> str:
        return os.path.join(self._round_dir(k), "_COMMIT")

    def committed_rounds(self) -> List[int]:
        root = os.path.join(self.state_dir, "rounds")
        if not os.path.isdir(root):
            return []
        out = []
        for name in os.listdir(root):
            if name.startswith("round="):
                k = int(name.split("=")[1])
                if os.path.exists(self._commit_path(k)):
                    out.append(k)
        return sorted(out)

    def last_committed(self) -> int:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else -1

    def _read_commit(self, k: int) -> dict:
        with open(self._commit_path(k)) as f:
            return json.load(f)

    # -------------------------------------------------------------- seeds
    def init_from_seeds(self, seeds: DataFrame) -> None:
        """Round 0: seed frontier.  ``seeds`` columns: url, seed_rank, query.
        Seeds order by seed_rank → priority (0, -1, seed_rank)."""
        canon = urlops.canonical_url_col(F.col("url"))
        frontier = (
            seeds.select(
                canon.alias("canonical_url"),
                F.col("seed_rank"),
                F.col("query"),
            )
            .where(urlops.is_valid_url_col(F.col("canonical_url")))
            .withColumn("url_hash", urlops.url_hash_col(F.col("canonical_url")))
            .withColumn("host", urlops.host_col(F.col("canonical_url")))
            .withColumn("path", urlops.path_col(F.col("canonical_url")))
            .withColumn("depth", F.lit(0))
            .withColumn("parent_seq", F.lit(-1).cast("long"))
            .withColumn("link_position", F.col("seed_rank").cast("int"))
            .drop("seed_rank")
        )
        rd = self._round_dir(0)
        if os.path.isdir(rd):
            shutil.rmtree(rd)
        frontier.write.mode("overwrite").parquet(os.path.join(rd, "frontier"))
        os.makedirs(os.path.join(rd, "bloom"), exist_ok=True)
        # seed count from the WRITTEN parquet (metadata-light, init-time
        # only): round 1's fetch-sequence boundary sample adapts to it —
        # with fetched == 0, frontier_size is the only batch-size signal
        # the first round has, and it is the round whose batch can be
        # largest (the full seed list)
        n_seeds = self._read_frontier(0).count()
        with open(self._commit_path(0), "w") as f:
            json.dump(
                {"round": 0, "fetched": 0, "total_fetched": 0,
                 "frontier_size": int(n_seeds),
                 "format_version": STATE_FORMAT_VERSION},
                f,
            )

    # -------------------------------------------------------------- round
    def _read_frontier(self, k: int) -> DataFrame:
        return self.spark.read.schema(FRONTIER_SCHEMA).parquet(
            os.path.join(self._round_dir(k), "frontier")
        )

    def _read_seen(self, upto_round: int) -> Optional[DataFrame]:
        """Exact seen set ≤ upto_round: the compacted base (if one covers a
        prefix of rounds) plus the per-round deltas after it, minus
        tombstoned (expired) records.  Without compaction this unions one
        parquet dir per round — file-listing and small-file read
        amplification that grows linearly with crawl length; with it, the
        union is one consolidated dir + a bounded tail."""
        c = self.compacted_upto()
        base = None
        start = 1
        if 0 < c <= upto_round:
            base = self.spark.read.parquet(os.path.join(self._compact_dir(), "data"))
            start = c + 1
        paths = [
            os.path.join(self._round_dir(k), "seen_delta")
            for k in self.committed_rounds()
            if start <= k <= upto_round
            and os.path.isdir(os.path.join(self._round_dir(k), "seen_delta"))
        ]
        if not paths:
            seen = base
        else:
            deltas = self.spark.read.parquet(*paths)
            seen = deltas if base is None else base.unionByName(deltas)
        if seen is None:
            return None
        tomb = self._read_tombstones()
        if tomb is not None:
            # cancel only records from AT/BEFORE the expiry round — a
            # refetch after expiry writes a newer delta row that survives
            seen = seen.alias("s").join(
                F.broadcast(tomb).alias("t"),
                (F.col("s.canonical_url") == F.col("t.t_url"))
                & (F.col("s.round") <= F.col("t.expired_at")),
                "left_anti",
            )
        return seen

    # ----------------------------------------------------- recrawl / TTL
    def _tombstones_dir(self) -> str:
        return os.path.join(self.state_dir, "tombstones")

    def _requeue_dir(self) -> str:
        return os.path.join(self.state_dir, "requeue")

    _TOMBSTONE_SCHEMA = "t_url string, expired_at int"

    def _read_tombstones(self) -> Optional[DataFrame]:
        root = self._tombstones_dir()
        if not os.path.isdir(root):
            return None
        # .tmp dirs are in-flight/crashed expire() writes — never read them
        batches = [
            os.path.join(root, n)
            for n in sorted(os.listdir(root))
            if not n.endswith(".tmp")
        ]
        if not batches:
            return None
        return self.spark.read.schema(self._TOMBSTONE_SCHEMA).parquet(*batches)

    def _next_expire_seq(self) -> int:
        """Monotonic expire-batch counter, persisted in the state dir (the
        increment is written before the batch, so a crash at worst skips a
        number — never reuses one)."""
        path = os.path.join(self.state_dir, "expire_seq")
        if os.path.exists(path):
            # an unreadable/corrupt counter must NOT silently reset to 0 —
            # that reintroduces batch-name reuse (a reused name matching a
            # committed consumed_requeue entry suppresses the recrawl)
            with open(path) as f:
                raw = f.read().strip()
            try:
                seq = int(raw)
            except ValueError as exc:
                raise RuntimeError(
                    f"corrupt expire_seq counter at {path!r}: {raw!r}"
                ) from exc
        else:
            seq = 0
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(seq + 1))
        os.replace(tmp, path)
        return seq

    def _consumed_requeue(self) -> set:
        """Requeue batches recorded as consumed by committed rounds.
        Cached incrementally per engine instance — without the cache a
        k-round crawl re-opens all k commit JSONs every round (O(k²)
        driver file I/O over a long crawl)."""
        if not hasattr(self, "_rq_cache"):
            self._rq_cache: dict[int, list] = {}
        names = set()
        for k in self.committed_rounds():
            if k not in self._rq_cache:
                self._rq_cache[k] = self._read_commit(k).get("consumed_requeue", [])
            names.update(self._rq_cache[k])
        return names

    def expire(self, urls: DataFrame, requeue: bool = True) -> int:
        """Recrawl/TTL: mark already-fetched URLs as expired so they become
        fetchable again (the distributed analog of the reference's
        cache-TTL, models/config.py:169-172).

        Writes a TOMBSTONE batch — the seen-set view cancels records up to
        the expiry round, so per-round deltas stay immutable and resume is
        unaffected — and (with ``requeue=True``) a requeue batch of
        frontier rows (priority = original depth, original fetch_seq) that
        the next round folds into its frontier; consumption is recorded in
        that round's commit, so a crash between expire and commit simply
        re-consumes.  The prefilter is NOT touched: a stale maybe_seen just
        routes the URL through the exact anti-join, which now lets it pass
        (the cuckoo backend's delete can additionally tighten the filter
        out-of-band).  Returns the number of URLs expired."""
        seen = self.seen()
        if seen is None:
            return 0
        target = urls.select(F.col("canonical_url")).distinct()
        records = seen.join(target, "canonical_url", "inner").cache()
        caches.register(records)  # drainable even if a write below fails
        n = records.count()
        if n == 0:
            caches.release(records)
            return 0
        expired_at = self.last_committed()
        t_root = self._tombstones_dir()
        # Monotonic persistent sequence, NOT a dir count: pruning deletes
        # tombstone batches, so a count-derived name would collide with a
        # surviving requeue dir of the same name (os.rename failure) or —
        # worse — with a name already in a commit's consumed_requeue list,
        # silently suppressing the new batch's recrawl.
        batch = f"batch-{self._next_expire_seq():08d}-at{expired_at}"
        # crash-safe: write to a .tmp dir, atomic-rename into place last —
        # readers skip .tmp, so a killed expire() can never poison reads
        t_tmp = os.path.join(t_root, batch + ".tmp")
        (
            records.select(
                F.col("canonical_url").alias("t_url"),
                F.lit(expired_at).alias("expired_at"),
            )
            .write.mode("overwrite")
            .parquet(t_tmp)
        )
        if requeue:
            rq = records.select(
                "canonical_url",
                "url_hash",
                "host",
                urlops.path_col(F.col("canonical_url")).alias("path"),
                F.col("depth").cast("int"),
                F.coalesce(F.col("fetch_seq"), F.lit(-1)).cast("long").alias("parent_seq"),
                F.lit(0).alias("link_position"),
                F.lit(None).cast("string").alias("query"),
            )
            rq_tmp = os.path.join(self._requeue_dir(), batch + ".tmp")
            rq.write.mode("overwrite").parquet(rq_tmp)
            os.rename(rq_tmp, os.path.join(self._requeue_dir(), batch))
        os.rename(t_tmp, os.path.join(t_root, batch))
        caches.release(records)
        return n

    # -------------------------------------------------------- compaction
    def _compact_dir(self) -> str:
        return os.path.join(self.state_dir, "seen_compact")

    def compacted_upto(self) -> int:
        """Highest round covered by a committed compaction (-1 if none)."""
        try:
            with open(os.path.join(self._compact_dir(), "_COMPACT")) as f:
                return int(json.load(f)["upto_round"])
        except (OSError, ValueError, KeyError):
            return -1

    def compact_seen(self, upto_round: Optional[int] = None) -> int:
        """Consolidate seen deltas ≤ upto_round (default: last committed)
        into one hash-partitioned parquet dir.

        Incremental (reads the previous compact + only the new tail) and
        crash-safe: the new compact is fully written to a temp dir BEFORE
        the old one is swapped out, and readers require the _COMPACT marker
        — a crash mid-swap just falls back to the per-round deltas (the
        compact is derived data; the deltas remain the source of truth for
        fetched_log/resume)."""
        upto = self.last_committed() if upto_round is None else upto_round
        if upto <= self.compacted_upto():
            return self.compacted_upto()
        seen = self._read_seen(upto)
        if seen is None:
            return -1
        final = self._compact_dir()
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        p = self.cfg.bloom_partitions
        (
            seen.repartition(p, F.pmod(F.col("url_hash"), F.lit(p)))
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "data"))
        )
        with open(os.path.join(tmp, "_COMPACT"), "w") as f:
            json.dump({"upto_round": upto,
                       "format_version": STATE_FORMAT_VERSION}, f)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        # Prune tombstone batches the compaction superseded: the base is
        # tombstone-filtered, and tail deltas all have round > upto, so a
        # batch with expired_at <= upto can never match anything again.
        t_root = self._tombstones_dir()
        if os.path.isdir(t_root):
            for name in os.listdir(t_root):
                if name.endswith(".tmp"):
                    continue
                _, _, at = name.rpartition("-at")
                if at.isdigit() and int(at) <= upto:
                    shutil.rmtree(os.path.join(t_root, name))
        return upto

    def _edges_compact_dir(self) -> str:
        return os.path.join(self.state_dir, "edges_compact")

    def _edges_live_dir(self) -> Optional[str]:
        """The directory holding a complete edge compaction: the final dir,
        or — during the rename-aside swap window of
        :meth:`compact_host_edges` (crash between the two renames) — the
        ``.old`` dir it was moved to.  None when no compaction committed."""
        final = self._edges_compact_dir()
        for d in (final, final + ".old"):
            if os.path.isfile(os.path.join(d, "_COMPACT")):
                return d
        return None

    def edges_compacted_upto(self) -> int:
        """Highest round covered by a committed edge compaction (-1 if
        none)."""
        return edges_compact_live(self.state_dir)[0]

    def compact_host_edges(self, upto_round: Optional[int] = None) -> int:
        """Consolidate the per-round host→host edge deltas ≤ upto_round
        into one distinct parquet dir — bounds the link-rank recompute's
        read fan-in on long crawls the way compact_seen bounds the novelty
        anti-join's.  Incremental (previous compact + only the new tail)
        and crash-safe (full temp-dir write, then marker, then swap); the
        compact is derived data, so superseded per-round deltas may be
        retired by retention afterwards."""
        upto = self.last_committed() if upto_round is None else upto_round
        prev = self.edges_compacted_upto()
        if upto <= prev:
            return prev
        dirs = [
            d
            for j in self.committed_rounds()
            if prev < j <= upto
            for d in [os.path.join(self._round_dir(j), "host_edges")]
            if os.path.isdir(d)
        ]
        final = self._edges_compact_dir()
        live = self._edges_live_dir()
        if prev >= 0 and live is not None:
            base = os.path.join(live, "data")
            if os.path.isdir(base):
                dirs.append(base)
        if not dirs:
            return prev
        tmp = final + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        (
            self.spark.read.parquet(*dirs)
            .distinct()
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "data"))
        )
        with open(os.path.join(tmp, "_COMPACT"), "w") as f:
            json.dump({"upto_round": upto,
                       "format_version": STATE_FORMAT_VERSION}, f)
        # swap via rename-aside, not rmtree-then-rename: a crash between a
        # delete and the rename-in would leave only the .tmp dir, and since
        # superseded per-round edge deltas may be retired by retention, that
        # window could permanently lose compacted edge history (ADVICE r03).
        # Invariant at every instant: a complete compaction exists at
        # `final` or `final.old` (edges_compacted_upto falls back to .old);
        # a live .old is only deleted AFTER the new final is in place.
        old = final + ".old"
        if os.path.isdir(final):
            if os.path.isdir(old):
                shutil.rmtree(old)
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.isdir(old):
            shutil.rmtree(old)
        return upto

    def _host_edge_inputs(self, committed: List[int]) -> List[str]:
        """Edge-delta dirs for a rank recompute: the committed compact (if
        any) plus only the per-round deltas after it.  Duplicate pairs
        across compact and tail are harmless — pagerank distincts edges."""
        base_upto, base = edges_compact_live(self.state_dir)
        out = []
        if base is not None:
            out.append(base)
        else:
            base_upto = -1
        out += [
            d
            for j in committed
            if j > base_upto
            for d in [os.path.join(self._round_dir(j), "host_edges")]
            if os.path.isdir(d)
        ]
        return out

    def run_round(self, k: int) -> Optional[dict]:
        """Execute round ``k`` (requires round ``k-1`` committed).
        Returns the commit record, or None if the frontier is exhausted."""
        prev = self._read_commit(k - 1)
        # Requeue batches not yet consumed by a committed round (recrawl).
        rq_root = self._requeue_dir()
        pending_requeue: List[str] = []
        if os.path.isdir(rq_root):
            done = self._consumed_requeue()
            pending_requeue = sorted(
                n for n in os.listdir(rq_root)
                if n not in done and not n.endswith(".tmp")
            )
        # Emptiness check comes free from the previous round's commit record
        # (round 0 always has seeds); pending requeue keeps the crawl alive.
        if prev.get("frontier_size") == 0 and not pending_requeue:
            return None
        frontier = self._read_frontier(k - 1)
        if pending_requeue:
            rq = self.spark.read.schema(FRONTIER_SCHEMA).parquet(
                *[os.path.join(rq_root, n) for n in pending_requeue]
            )
            # fold into the frontier, min-priority per URL (a URL can be
            # both carried and requeued)
            frontier = (
                frontier.unionByName(rq)
                .groupBy("canonical_url")
                .agg(
                    F.min(
                        F.struct(
                            "depth", "parent_seq", "link_position",
                            "url_hash", "host", "path", "query",
                        )
                    ).alias("p")
                )
                .select(
                    "canonical_url",
                    F.col("p.url_hash").alias("url_hash"),
                    F.col("p.host").alias("host"),
                    F.col("p.path").alias("path"),
                    F.col("p.depth").alias("depth"),
                    F.col("p.parent_seq").alias("parent_seq"),
                    F.col("p.link_position").alias("link_position"),
                    F.col("p.query").alias("query"),
                )
            )

        rd = self._round_dir(k)
        if os.path.isdir(rd):  # uncommitted leftovers from a crash
            shutil.rmtree(rd)
        os.makedirs(rd, exist_ok=True)

        # 1. robots gate (broadcast join, J3) + token-bucket state (W5)
        prev_tokens_path = os.path.join(self._round_dir(k - 1), "host_tokens")
        prev_tokens = (
            self.spark.read.parquet(prev_tokens_path)
            if os.path.isdir(prev_tokens_path)
            else None
        )
        # Persisted: three consumers (blocked paths, politeness selection,
        # token accounting) would otherwise each recompute the scan + join.
        # At the 10^10 design point this spills MEMORY_AND_DISK per executor
        # rather than re-reading the frontier from storage three times.
        gated = politeness.apply_robots(
            frontier, self.robots, self.cfg.round_seconds,
            host_tokens=prev_tokens, burst_rounds=self.cfg.burst_rounds,
        ).persist()
        # round-scoped persists register at creation so a round that
        # raises mid-flight leaves them drainable (the next round's
        # commit drain, or release_caches()) instead of stranded
        caches.register(gated)
        blocked = gated.where(~F.col("allowed")).select(*frontier.columns)
        eligible = gated.where(F.col("allowed"))

        # 1b. link-rank budget feedback: PageRank over the host→host edges
        # committed rounds accumulated (written in step 5b) rescales each
        # eligible host's budget by link authority before batch selection.
        # The edge files are distinct host pairs — host²-bounded metadata,
        # and the eager rank table is host-cardinality (broadcast join).
        # Politeness stays amortized: a >1× factor overdraws the host's
        # token bucket (step 10 books actual fetches), so authority buys a
        # burst, and the debt throttles the following rounds back to the
        # robots-derived rate.
        link_rank_applied = False
        link_rank_recomputed = False
        if self.cfg.link_rank_budget:
            from ..operators import linkrank

            committed = self.committed_rounds()
            # rerank cadence is derived purely from the on-disk layout (the
            # latest committed round that wrote a rank table) — resume-safe,
            # and an uncommitted crash rewinds it with the round itself
            ranked = [
                j
                for j in committed
                if os.path.isdir(os.path.join(self._round_dir(j), "host_ranks"))
            ]
            ranks = None
            if ranked and k - ranked[-1] < self.cfg.link_rank_every:
                ranks = self.spark.read.parquet(
                    os.path.join(self._round_dir(ranked[-1]), "host_ranks")
                )
            else:
                edge_dirs = self._host_edge_inputs(committed)
                if edge_dirs:
                    teleport = (
                        self._read_frontier(0).select(
                            F.col("host").alias("node")
                        ).distinct()
                        if self.cfg.link_rank_focus
                        else None
                    )
                    linkrank.pagerank(
                        self.spark.read.parquet(*edge_dirs),
                        src_col="src_host",
                        dst_col="dst_host",
                        iterations=self.cfg.link_rank_iterations,
                        eager=True,
                        teleport=teleport,
                    ).select(
                        F.col("node").alias("host"), "rank_micro"
                    ).write.mode("overwrite").parquet(
                        os.path.join(rd, "host_ranks")
                    )
                    ranks = self.spark.read.parquet(
                        os.path.join(rd, "host_ranks")
                    )
                    link_rank_recomputed = True
            if ranks is not None:
                eligible = linkrank.apply_link_rank(eligible, ranks)
                link_rank_applied = True

        # 2. politeness batch selection (salted two-phase window, W5)
        selected, remainder = politeness.select_batch(eligible, self.cfg.num_salts)
        selected = politeness.global_fetch_sequence(
            selected,
            offset=int(prev["total_fetched"]),
            # last round's batch size is already in the commit record —
            # a cost-free estimate that keeps the boundary sample at
            # ~40 keys/bucket however large the round batch grows.  Round
            # 1 (and a resumed stall round) has fetched == 0, exactly when
            # the batch can be largest (the full seed list), so fall back
            # to the committed frontier size — an upper bound on the
            # batch, which errs on the sparse/memory-safe side.
            est_batch_rows=int(prev.get("fetched", 0))
            or int(prev.get("frontier_size", 0)),
        ).cache()
        caches.register(selected)

        # 3. fetch-simulate (J2): left join against the page store
        pages = self.spark.read.parquet(self.pages_path).select("url", "html")
        batch = selected.join(
            pages, selected.canonical_url == pages.url, how="left"
        ).drop("url")
        batch = batch.withColumn(
            "fetch_status", F.when(F.col("html").isNotNull(), "ok").otherwise("miss")
        ).cache()
        caches.register(batch)

        # 4. extraction (vectorized kernel) over successfully "fetched" pages;
        # lineage columns ride through the kernel as passthrough — no
        # post-kernel re-join (which would shuffle the whole results table).
        to_extract = batch.where(F.col("fetch_status") == "ok").select(
            F.col("canonical_url").alias("url"), "html", "query", "fetch_seq", "depth"
        )
        results = extract_pages(
            to_extract.withColumn("mode", F.lit(self.cfg.mode).cast("string")),
            opts=self.cfg.extract_opts,
            passthrough=["fetch_seq", "depth"],
        )
        results.write.mode("overwrite").parquet(os.path.join(rd, "results"))
        results = self.spark.read.parquet(os.path.join(rd, "results"))

        # 5. discovered links → candidates (explode, canonicalize, prioritize)
        exploded = results.select(
            "fetch_seq",
            "depth",
            F.posexplode("out_links").alias("link_position", "raw_url"),
        )
        cand = (
            exploded.withColumn("canonical_url", urlops.canonical_url_col(F.col("raw_url")))
            .where(urlops.is_valid_url_col(F.col("canonical_url")))
            .where(F.col("canonical_url").rlike("^https?://"))
            .select(
                "canonical_url",
                (F.col("depth") + 1).alias("depth"),
                F.col("fetch_seq").alias("parent_seq"),
                F.col("link_position").cast("int"),
            )
        )
        # in-round dedup: keep the minimum priority per canonical URL
        cand = (
            cand.groupBy("canonical_url")
            .agg(
                F.min(F.struct("depth", "parent_seq", "link_position")).alias("p")
            )
            .select(
                "canonical_url",
                F.col("p.depth").alias("depth"),
                F.col("p.parent_seq").alias("parent_seq"),
                F.col("p.link_position").alias("link_position"),
            )
            .withColumn("url_hash", urlops.url_hash_col(F.col("canonical_url")))
            .withColumn("host", urlops.host_col(F.col("canonical_url")))
            .withColumn("path", urlops.path_col(F.col("canonical_url")))
            .withColumn("query", F.lit(None).cast("string"))
        )

        # 5b. host-graph delta for the link-rank feedback: distinct
        # src_host→dst_host pairs discovered this round.  Derived from the
        # SAME exploded links as the candidates but before their in-round
        # min-priority dedup (which keeps one parent per URL and would drop
        # cross-host co-citations); `selected` is the cached batch, so the
        # fetch_seq→host join adds no new scan, and the distinct output is
        # host²-bounded — tiny next to the results write it derives from.
        if self.cfg.link_rank_budget:
            host_edges = (
                exploded.withColumn(
                    "_c", urlops.canonical_url_col(F.col("raw_url"))
                )
                .where(urlops.is_valid_url_col(F.col("_c")))
                .select(
                    "fetch_seq", urlops.host_col(F.col("_c")).alias("dst_host")
                )
                .join(
                    selected.select(
                        "fetch_seq", F.col("host").alias("src_host")
                    ),
                    "fetch_seq",
                )
                .select("src_host", "dst_host")
                .distinct()
            )
            host_edges.write.mode("overwrite").parquet(
                os.path.join(rd, "host_edges")
            )

        # 6. novelty: bloom pre-filter, exact anti-join only on maybe_seen (J1)
        prev_bloom = os.path.join(self._round_dir(k - 1), "bloom")
        flagged = self.bloom.flag_maybe_seen(cand, prev_bloom).cache()
        caches.register(flagged)
        definitely_new = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
        seen = self._read_seen(k - 1)
        if seen is not None:
            maybe = maybe.join(
                seen.select("canonical_url"), on="canonical_url", how="left_anti"
            )
        survivors = definitely_new.unionByName(maybe)
        # exclude URLs fetched this round and URLs still waiting in the frontier
        survivors = survivors.join(
            selected.select("canonical_url"), on="canonical_url", how="left_anti"
        ).join(
            remainder.select("canonical_url"), on="canonical_url", how="left_anti"
        ).join(
            blocked.select("canonical_url"), on="canonical_url", how="left_anti"
        )

        # 7. next frontier = politeness remainder ∪ new discoveries.  The
        # ``origin`` marker column lets the commit record derive both counts
        # from the written files (readers use the explicit FRONTIER_SCHEMA,
        # which simply ignores it).
        cols = [c.split()[0] for c in FRONTIER_SCHEMA.split(", ")]
        next_frontier = (
            remainder.select(*cols).withColumn("origin", F.lit("carried"))
            .unionByName(
                survivors.select(*cols).withColumn("origin", F.lit("discovered"))
            )
        )

        # 7b. crawl-trap guard: profile the next frontier's (host, template)
        # explosion counts and sample flagged templates down BEFORE the
        # frontier is persisted — a calendar/session-id trap discovered this
        # round must not snowball into round k+1's politeness/novelty work.
        # The profile is one map-side-combined aggregation; its flagged set
        # is template-cardinality (checkpointed, counted for the commit
        # record, then broadcast by prune_traps).
        n_trap_patterns = 0
        if self.cfg.trap_threshold > 0:
            suspects = (
                traps.url_pattern_profile(
                    next_frontier, threshold=self.cfg.trap_threshold
                )
                .where("trap_suspect")
                .select("host", "url_pattern")
                .localCheckpoint(eager=True)
            )
            n_trap_patterns = suspects.count()
            if n_trap_patterns:
                next_frontier = traps.prune_traps(
                    next_frontier,
                    threshold=self.cfg.trap_threshold,
                    keep_per_pattern=self.cfg.trap_keep_per_pattern,
                    suspects=suspects,
                )
        next_frontier.write.mode("overwrite").parquet(os.path.join(rd, "frontier"))

        # 8. seen delta: everything attempted this round + robots-blocked.
        # Doubles as the fetched-order log (fetched_log() filters/projects
        # it) — one write instead of two for the same rows.
        seen_delta = (
            batch.select(
                "canonical_url",
                "url_hash",
                "host",
                "fetch_seq",
                "depth",
                F.col("fetch_status"),
                F.lit(k).alias("round"),
                F.lit(True).alias("was_new"),
            )
            .unionByName(
                blocked.select(
                    "canonical_url",
                    "url_hash",
                    "host",
                    F.lit(None).cast("long").alias("fetch_seq"),
                    "depth",
                    F.lit("robots_blocked").alias("fetch_status"),
                    F.lit(k).alias("round"),
                    F.lit(True).alias("was_new"),
                )
            )
        )
        seen_delta.write.mode("overwrite").parquet(os.path.join(rd, "seen_delta"))
        seen_delta = self.spark.read.parquet(os.path.join(rd, "seen_delta"))

        # 9. bloom segments for round k (executor-side, one file per task)
        self.bloom.update(
            seen_delta.select("canonical_url", "url_hash"),
            prev_dir=prev_bloom,
            out_dir=os.path.join(rd, "bloom"),
        )

        # 10. token-bucket state for round k: per eligible host,
        #     available - used (hosts absent from the frontier drop out and
        #     restart at one refill when rediscovered)
        host_avail = eligible.select("host", "tokens_available").distinct()
        used = batch.groupBy("host").agg(F.count("*").alias("_used"))
        new_tokens = (
            host_avail.join(used, on="host", how="left")
            .select(
                "host",
                (
                    F.col("tokens_available")
                    - F.coalesce(F.col("_used"), F.lit(0))
                ).alias("tokens"),
            )
        )
        new_tokens.write.mode("overwrite").parquet(os.path.join(rd, "host_tokens"))

        # 11. per-partition lineage metrics (A8 / north-rule requirement)
        metrics = (
            results.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count("*").alias("pages_extracted"),
                F.sum(F.length("content")).alias("content_chars"),
                F.sum(F.size("out_links")).alias("links_found"),
                F.avg("confidence_score").alias("avg_confidence"),
            )
            .withColumn("round", F.lit(k))
        )
        metrics.write.mode("overwrite").parquet(os.path.join(rd, "metrics"))

        # Commit-record counts come from the WRITTEN outputs (two tiny
        # metadata-backed jobs) instead of re-running the plans that produced
        # them — at scale, recomputing the robots join / novelty chain just
        # to count it would double the round's work.
        status_counts = {
            r["fetch_status"]: r["count"]
            for r in seen_delta.groupBy("fetch_status").count().collect()
        }
        origin_counts = {
            r["origin"]: r["count"]
            for r in self.spark.read.parquet(os.path.join(rd, "frontier"))
            .groupBy("origin").count().collect()
        }
        n_fetched = sum(
            v for s, v in status_counts.items() if s != "robots_blocked"
        )
        record = {
            "round": k,
            "fetched": n_fetched,
            "blocked": status_counts.get("robots_blocked", 0),
            "new_urls": origin_counts.get("discovered", 0),
            "frontier_size": sum(origin_counts.values()),
            "total_fetched": int(prev["total_fetched"]) + n_fetched,
            # requeue batches folded into this round's frontier; recording
            # them here (atomically with the round) is what makes expire()
            # crash-safe — an uncommitted round simply re-consumes them
            "consumed_requeue": pending_requeue,
            # (host, template) pairs the trap guard flagged and sampled this
            # round (0 when the guard is disabled or nothing exploded)
            "trap_patterns": n_trap_patterns,
            # whether PageRank budget feedback rescaled this round's host
            # budgets (False until the first committed round writes edges),
            # and whether the rank table was recomputed this round or
            # reused under the link_rank_every cadence
            "link_rank_applied": link_rank_applied,
            "link_rank_recomputed": link_rank_recomputed,
        }
        # drain the session registry: the round's own persists (gated /
        # selected / batch / flagged, registered at creation so a round
        # that raises mid-flight leaves them drainable too),
        # global_fetch_sequence's arranged projection, and any other
        # intra-round hand-off must not outlive the round — a long crawl
        # would otherwise strand one batch-sized cache per round.  Round
        # commit is a safe drain point: everything the round produced is
        # on disk, and registered caches are recomputable persists,
        # never cuts.
        caches.release_all()
        # 12. atomic commit marker — written LAST
        with open(self._commit_path(k), "w") as f:
            json.dump(record, f)
        return record

    # ---------------------------------------------------------------- run
    def run(self, max_rounds: Optional[int] = None) -> List[dict]:
        """Run rounds until the frontier is exhausted (or max_rounds),
        resuming after the last committed round."""
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        records = []
        k = self.last_committed() + 1
        if k == 0:
            raise RuntimeError("call init_from_seeds() first")
        while len(records) < limit:
            rec = self.run_round(k)
            if rec is None:
                break
            records.append(rec)
            if (
                self.cfg.compact_every > 0
                and k - self.compacted_upto() >= self.cfg.compact_every
            ):
                self.compact_seen(k)
                if self.cfg.link_rank_budget:
                    self.compact_host_edges(k)
            k += 1
        return records

    # ------------------------------------------------------------ readers
    def fetched_log(self) -> DataFrame:
        """Fetched-order log (golden_crawl comparison surface) — a
        filter/projection of the per-round seen deltas."""
        paths = [
            os.path.join(self._round_dir(k), "seen_delta")
            for k in self.committed_rounds()
            if k > 0
        ]
        return (
            self.spark.read.parquet(*paths)
            .where(F.col("fetch_status") != "robots_blocked")
            .select("round", "fetch_seq", "canonical_url", "host",
                    "fetch_status", "depth")
        )

    def results(self) -> DataFrame:
        paths = [
            os.path.join(self._round_dir(k), "results")
            for k in self.committed_rounds()
            if k > 0
        ]
        return self.spark.read.parquet(*paths)

    def seen(self) -> Optional[DataFrame]:
        return self._read_seen(self.last_committed())
