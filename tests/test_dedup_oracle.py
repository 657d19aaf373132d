"""Independent oracles for the hashing dedup kernels.

Round-1 left MinHash/SimHash self-certified (`no_oracle`).  These tests
falsify them from outside the engine:

* signatures are recomputed with a SECOND implementation — plain Python
  loops over hashlib.md5, no numpy broadcasting, no engine kernels — and
  compared exactly;
* the LSH-recall precondition behind the exact-Jaccard DuckDB oracle of
  `minhash_near_dup` is asserted (banding loses no J ≥ 0.5 pair on the
  test corpus);
* the degenerate-bucket guards are exercised on an adversarial corpus
  (hundreds of identical documents) and shown to bound the candidate set,
  with the skipped-bucket counter surfacing what was dropped.
"""

import hashlib
import itertools
import re

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from crawler_engine_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"

MERSENNE = (1 << 61) - 1
U64 = 1 << 64


def _docs(limit=100):
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    return list(zip(tbl["doc_id"], tbl["text"]))[:limit]


# -- independent reimplementations (loops + hashlib only) -------------------


def _oracle_h64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _oracle_shingles(text: str, n: int = 3) -> set:
    toks = [t for t in re.split(r"[^\w]+", (text or "").lower()) if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _oracle_minhash(text: str, num_perm: int = 64) -> list:
    rng = np.random.RandomState(42)
    a = [int(x) for x in rng.randint(1, MERSENNE, size=num_perm)]
    b = [int(x) for x in rng.randint(0, MERSENNE, size=num_perm)]
    hs = [_oracle_h64(s) for s in _oracle_shingles(text)]
    if not hs:
        return [0] * num_perm
    sig = []
    for p in range(num_perm):
        best = None
        for h in hs:
            v = ((a[p] * h + b[p]) % U64) % MERSENNE
            if best is None or v < best:
                best = v
        sig.append(best)
    return sig


def _oracle_simhash(text: str) -> int:
    toks = [w for w in str(text or "").lower().split() if w]
    if not toks:
        return 0
    votes = [0] * 64
    for w in toks:
        h = _oracle_h64(w)
        for bit in range(64):
            votes[bit] += 1 if (h >> bit) & 1 else -1
    sig = 0
    for bit in range(64):
        if votes[bit] > 0:
            sig |= 1 << bit
    if sig >= 1 << 63:  # engine emits signed int64
        sig -= 1 << 64
    return sig


# -- tests ------------------------------------------------------------------


def test_minhash_signatures_match_independent_oracle(spark):
    docs = _docs(100)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: list(r["sig"])
        for r in df.select(
            "doc_id", dedup.make_minhash_udf(64, 3)(F.col("text")).alias("sig")
        ).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _oracle_minhash(text), f"doc {doc_id}"


def test_simhash_matches_independent_oracle(spark):
    docs = _docs(100)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["sig"]
        for r in df.select(
            "doc_id", dedup.simhash_udf(F.col("text")).alias("sig")
        ).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _oracle_simhash(text), f"doc {doc_id}"


def test_lsh_recall_complete_on_test_corpus(spark):
    """Precondition of the exact-Jaccard DuckDB oracle for minhash_near_dup:
    the banded buckets (64 perms / 32 bands) must recover EVERY pair with
    exact Jaccard ≥ 0.5 — otherwise the oracle equivalence breaks."""
    docs = _docs(500)
    sh = {i: _oracle_shingles(t) for i, t in docs}
    want = set()
    for (i, _), (j, _) in itertools.combinations(docs, 2):
        a, b = min(i, j), max(i, j)
        union = sh[a] | sh[b]
        if union and len(sh[a] & sh[b]) / len(union) >= 0.5:
            want.add((a, b))
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cand = dedup.minhash_lsh_candidates(df, "text", "doc_id", num_perm=64, bands=32)
    got = {(r.id_a, r.id_b) for r in cand.collect()}
    assert want <= got, f"LSH missed {sorted(want - got)[:5]}"


@pytest.fixture()
def degenerate_corpus(spark):
    """300 identical short docs (every band collides) + 20 distinct docs."""
    rows = [(i, "spam spam spam spam wonderful spam") for i in range(300)]
    rows += [(1000 + i, f"unique document number {i} with words {i * 7} and {i * 13}")
             for i in range(20)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_bucket_cap_bounds_degenerate_corpus(spark, degenerate_corpus):
    uncapped = dedup.minhash_lsh_candidates(
        degenerate_corpus, "text", "doc_id", num_perm=64, bands=32
    )
    capped = dedup.minhash_lsh_candidates(
        degenerate_corpus, "text", "doc_id", num_perm=64, bands=32,
        max_bucket_size=50,
    )
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 300 * 299 // 2  # quadratic blow-up without the guard
    assert n_cap <= 50 * 49 // 2 * 32  # every surviving bucket is bounded
    assert n_cap < n_un / 10

    banded = dedup.minhash_banded(degenerate_corpus, "text", "doc_id", 64, 32)
    stats = dedup.lsh_bucket_stats(banded, max_bucket_size=50)
    assert stats["skipped_buckets"] >= 32  # the identical-doc bucket per band
    assert stats["skipped_rows"] >= 300 * 32
    assert stats["max_bucket"] >= 300


def test_simhash_bucket_cap_bounds_degenerate_corpus(spark, degenerate_corpus):
    uncapped = dedup.simhash_candidates(degenerate_corpus, "text", "doc_id")
    capped = dedup.simhash_candidates(
        degenerate_corpus, "text", "doc_id", max_bucket_size=50
    )
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 300 * 299 // 2
    assert n_cap < n_un / 10


# -- hypothesis fuzz: the kernels must agree with the loop oracles on ------
# -- arbitrary unicode, not just the synthetic corpus ----------------------

from hypothesis import given, settings, strategies as st

_texts = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=40,
    ),
    min_size=1,
    max_size=12,
).map(lambda ws: " ".join(ws))


@settings(max_examples=30, deadline=None)
@given(_texts)
def test_minhash_kernel_fuzz_vs_loop_oracle(text):
    import pandas as pd

    from crawler_engine_spark.operators.dedup import _minhash_batch, _minhash_params

    # drive the real vectorized batch body (no Spark session per example)
    a, b = _minhash_params(64)
    got = list(_minhash_batch(pd.Series([text]), a, b, 3).iloc[0])
    assert got == _oracle_minhash(text)


@settings(max_examples=30, deadline=None)
@given(_texts)
def test_simhash_kernel_fuzz_vs_loop_oracle(text):
    import pandas as pd

    from crawler_engine_spark.operators.dedup import _simhash_batch

    got = int(_simhash_batch(pd.Series([text])).iloc[0])
    assert got == _oracle_simhash(text)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id labels
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    """Min-label propagation vs a pure-python union-find on a graph with a
    long chain (exercises multi-iteration convergence), a clique, an
    isolated pair, and a star."""
    edges = (
        [(i, i + 1) for i in range(10)]                 # chain 0..10
        + [(a, b) for a in (20, 21, 22) for b in (21, 22, 23) if a < b]  # clique
        + [(40, 41)]                                     # pair
        + [(50, x) for x in (51, 52, 53, 54)]            # star
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == _uf_components(edges)


def test_minhash_dedup_cc_is_transitive(spark):
    """sweep vs cc on a transitive-only component: docs 1 and 2 are each
    near-dup of 3 but not of each other — sweep keeps both, cc keeps only
    the cluster minimum."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " lambda lambda lambda mu nu xi"),
        (2, base + " omicron omicron omicron pi rho sigma"),
        (3, base + " lambda lambda lambda omicron omicron omicron"),
        (9, "completely different text about nothing shared at all here ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(threshold=0.45, num_perm=64, bands=32)
    sweep = {r["doc_id"] for r in
             dedup.minhash_dedup(df, "text", "doc_id", **kw).collect()}
    cc = {r["doc_id"] for r in
          dedup.minhash_dedup(df, "text", "doc_id", method="cc", **kw).collect()}
    # precondition: 1-3 and 2-3 are pairs, 1-2 is not
    pairs = dedup.verify_jaccard(
        dedup.minhash_lsh_candidates(df, "text", "doc_id", 64, 32),
        df, "text", "doc_id", 0.45,
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 3) in got_pairs and (2, 3) in got_pairs
    assert (1, 2) not in got_pairs
    assert sweep == {1, 2, 9}   # 3 dropped; 2 survives (no direct pair)
    assert cc == {1, 9}         # whole cluster collapses to its minimum


def test_connected_components_paths_agree(spark):
    """The driver-side union-find fast path and the distributed min-label
    propagation must return identical (node, component) sets."""
    edges = (
        [(i, i + 1) for i in range(12)]
        + [(100, 101), (101, 102), (100, 102)]
        + [(200, 201)]
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {
        (r["node"], r["component"])
        for r in dedup.connected_components(df).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in dedup.connected_components(df, driver_threshold=0).collect()
    }
    assert fast == dist and len(fast) == 13 + 3 + 2


def test_connected_components_reliable_materialization(spark, tmp_path):
    """materialize='reliable' (per-round label state written to parquet,
    executor-loss-safe — VERDICT r03 #5) must return exactly what the
    localCheckpoint mode returns, and must actually write step state."""
    import os

    edges = (
        [(i, i + 1) for i in range(12)]
        + [(100, 101), (101, 102), (100, 102)]
        + [(200, 201)]
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {
        (r["node"], r["component"])
        for r in dedup.connected_components(df, driver_threshold=0).collect()
    }
    scratch = str(tmp_path / "cc_scratch")
    reliable = {
        (r["node"], r["component"])
        for r in dedup.connected_components(
            df, driver_threshold=0, materialize="reliable",
            scratch_dir=scratch,
        ).collect()
    }
    assert reliable == local
    steps = [d for d in os.listdir(scratch) if d.startswith("step_")]
    assert len(steps) >= 3  # edges + initial labels + >=1 round
    # reliable without a scratch dir is a loud error, not a silent local
    import pytest

    with pytest.raises(ValueError):
        dedup.connected_components(df, materialize="reliable")


def test_connected_components_string_ids(spark):
    """Non-integer node ids (URL-keyed dedup, crawl.py corpus --id-col on a
    URL column) must work on BOTH paths — the driver fast path used to
    hardcode a long schema and crash on strings."""
    edges = [
        ("https://a/1", "https://a/2"),
        ("https://a/2", "https://a/3"),
        ("https://b/x", "https://b/y"),
    ]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    want = {
        ("https://a/1", "https://a/1"),
        ("https://a/2", "https://a/1"),
        ("https://a/3", "https://a/1"),
        ("https://b/x", "https://b/x"),
        ("https://b/y", "https://b/x"),
    }
    fast = {
        (r["node"], r["component"])
        for r in dedup.connected_components(df).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in dedup.connected_components(df, driver_threshold=0).collect()
    }
    assert fast == want and dist == want
    # schema carries the input id type on both paths
    assert dedup.connected_components(df).schema["node"].dataType.simpleString() == "string"


def test_connected_components_long_chain(spark):
    """A 10k-node chain needs 10k rounds under plain min-label propagation
    (the pre-shortcut implementation raised at max_iter=25); pointer
    jumping converges it in ~log2(10000)+1 ≈ 15 rounds."""
    n = 10_000
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = dedup.connected_components(df, driver_threshold=0, max_iter=25)
    comp = out.agg(
        F.countDistinct("component").alias("c"), F.count("*").alias("n"),
        F.min("component").alias("m"),
    ).first()
    assert (comp["c"], comp["n"], comp["m"]) == (1, n, 0)
