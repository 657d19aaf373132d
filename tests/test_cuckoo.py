"""Cuckoo-filter seen-set backend: no-false-negative membership (incl.
saturated segments via the stash), deletion (the recrawl/TTL primitive a
bloom filter cannot express), and end-to-end crawl parity with the bloom
backend."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_engine_spark.frontier.cuckoo import (
    CuckooSeenSet,
    _key_hashes,
    _Segment,
)

# ------------------------------------------------------------ segment unit


def test_segment_no_false_negatives_even_saturated(tmp_path):
    """Insert 4x more keys than slots: the stash must absorb the overflow
    so every inserted key still reports present."""
    seg = _Segment(n_buckets=8)  # 32 slots
    rng = np.random.RandomState(0)
    urls = [f"https://h{i}.example/p{i}" for i in range(128)]
    for u in urls:
        seg.insert(u, rng)
    assert all(seg.contains(u) for u in urls)
    assert len(seg.stash) > 0  # saturation actually happened

    # round-trips through the file format
    path = str(tmp_path / "seg.bin")
    seg.store(path)
    back = _Segment.load(path, 8)
    assert all(back.contains(u) for u in urls)
    assert back.stash == seg.stash


def test_segment_delete_removes_membership():
    seg = _Segment(n_buckets=1 << 10)
    rng = np.random.RandomState(1)
    urls = [f"https://host{i}.example/doc{i}" for i in range(200)]
    for u in urls:
        seg.insert(u, rng)
    victims = urls[::10]
    for u in victims:
        assert seg.delete(u)
    survivors = [u for u in urls if u not in victims]
    assert all(seg.contains(u) for u in survivors)
    # victims with a unique fingerprint are genuinely gone
    fps = {}
    for u in urls:
        fps.setdefault(_key_hashes(u, 1 << 10)[0], []).append(u)
    for u in victims:
        if len(fps[_key_hashes(u, 1 << 10)[0]]) == 1:
            assert not seg.contains(u)


def test_partner_bucket_relation_is_involution():
    for i, u in enumerate(f"https://x{k}.example/" for k in range(50)):
        fp, i1, i2 = _key_hashes(u, 1 << 12)
        from crawler_engine_spark.frontier.cuckoo import _fp_hash

        assert (i2 ^ _fp_hash(fp)) % (1 << 12) == i1


# ------------------------------------------------------------- spark level


@pytest.fixture()
def urls_df(spark):
    rows = [(f"https://h{i % 40}.example/p{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "canonical_url string")
    return df.withColumn("url_hash", F.xxhash64("canonical_url"))


def test_cuckoo_update_probe_delete_roundtrip(spark, urls_df, tmp_path):
    ck = CuckooSeenSet(num_partitions=4, buckets_per_segment=1 << 10)
    d1, d2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    ck.update(urls_df, None, d1)

    flagged = ck.flag_maybe_seen(urls_df, d1)
    assert flagged.where(~F.col("maybe_seen")).count() == 0  # no false negs

    fresh = urls_df.select(
        F.concat(F.lit("https://new"), F.col("canonical_url")).alias("canonical_url")
    ).withColumn("url_hash", F.xxhash64("canonical_url"))
    fresh_flagged = ck.flag_maybe_seen(fresh, d1)
    # false-positive rate must be small (16-bit fingerprints)
    assert fresh_flagged.where(F.col("maybe_seen")).count() <= 4

    # delete every 5th url → those become definitely-new again
    victims = urls_df.where(F.col("url_hash") % 5 == 0)
    ck.delete(victims, d1, d2)
    after = ck.flag_maybe_seen(victims, d2)
    assert after.where(F.col("maybe_seen")).count() <= 2  # fp collisions only
    keep = urls_df.where(F.col("url_hash") % 5 != 0)
    assert ck.flag_maybe_seen(keep, d2).where(~F.col("maybe_seen")).count() == 0


# ----------------------------------------------------------- engine parity


def test_crawl_with_cuckoo_backend_matches_bloom(spark, tmp_path):
    from crawler_engine_spark.data import gen
    from crawler_engine_spark.frontier.rounds import CrawlConfig, CrawlEngine

    pages = str(tmp_path / "pages")
    gen.gen_pages_df(spark, 120, partitions=2).write.parquet(pages)
    robots = spark.createDataFrame(
        pd.DataFrame(gen.gen_robots()),
        "host string, disallow_prefixes array<string>, crawl_delay_s double",
    )
    seeds = spark.createDataFrame(
        pd.DataFrame(gen.gen_seeds(120, 5)), "url string, seed_rank int, query string"
    )

    logs = {}
    for backend in ("bloom", "cuckoo"):
        state = str(tmp_path / f"state_{backend}")
        if os.path.isdir(state):
            shutil.rmtree(state)
        eng = CrawlEngine(
            spark, state, pages, robots,
            CrawlConfig(round_seconds=3.0, bloom_partitions=4,
                        bloom_bits_per_segment=1 << 14, seen_filter=backend),
        )
        eng.init_from_seeds(seeds)
        eng.run(max_rounds=3)
        logs[backend] = [
            (r["round"], r["fetch_seq"], r["canonical_url"])
            for r in eng.fetched_log().orderBy("round", "fetch_seq").collect()
        ]
    assert logs["cuckoo"] == logs["bloom"]
    assert len(logs["bloom"]) > 0
