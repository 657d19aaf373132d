"""Edge-case tests for the corpus-preparation operators
(operators/corpusops.py).  Engine-vs-oracle parity over the real tables is
locked by tests/test_entry_oracle.py; these tests pin the semantics the
small corpora can't exercise: oversized packing inputs, fully-duplicated
documents, repartition-stable sampling, mid-text contamination."""

import pandas as pd
from pyspark.sql import functions as F

from crawler_engine_spark.operators import corpusops


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema=schema)


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------


def test_pii_redaction_patterns(spark):
    df = _docs(
        spark,
        [
            (0, "mail a.b+c@ex-ample.org then 555-123-4567 then 10.0.0.1 end"),
            (1, "no pii here at all"),
            (2, "a@b.io x@y.co 1.2.3.4 5.6.7.8"),
        ],
    )
    counts = corpusops.pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            corpusops.redact_pii_col(F.col("text")).alias("red"),
            counts["n_emails"].alias("e"),
            counts["n_phones"].alias("p"),
            counts["n_ips"].alias("i"),
        ).collect()
    }
    assert out[0]["red"] == "mail <EMAIL> then <PHONE> then <IP> end"
    assert (out[0]["e"], out[0]["p"], out[0]["i"]) == (1, 1, 1)
    assert out[1]["red"] == "no pii here at all"
    assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (0, 0, 0)
    assert out[2]["red"] == "<EMAIL> <EMAIL> <IP> <IP>"
    assert (out[2]["e"], out[2]["p"], out[2]["i"]) == (2, 0, 2)


# --------------------------------------------------------------------------
# Repetition stats
# --------------------------------------------------------------------------


def test_repetition_stats_exact_small_doc(spark):
    # "a a a b" → n=4, top=3/4, dup=3/4, ttr=2/4, mwl=1.0
    df = _docs(spark, [(0, "a a a b")])
    r = corpusops.repetition_stats(df, "text", "doc_id").collect()[0]
    assert r["n_tokens"] == 4
    assert r["top_token_frac"] == 0.75
    assert r["dup_token_frac"] == 0.75
    assert r["type_token_ratio"] == 0.5
    assert r["mean_word_len"] == 1.0
    assert r["gopher_keep"] is False  # n_tokens < 15


def test_repetition_stats_drops_blank_docs(spark):
    df = _docs(spark, [(0, "   "), (1, "one two three")])
    got = corpusops.repetition_stats(df, "text", "doc_id").collect()
    assert [r["doc_id"] for r in got] == [1]


# --------------------------------------------------------------------------
# Decontamination
# --------------------------------------------------------------------------


def test_decontaminate_flags_midtext_overlap(spark):
    bench = spark.createDataFrame([("q r s t u",)], "gram string")
    df = _docs(
        spark,
        [
            (0, "x y q r s t u z"),  # gram appears mid-text
            (1, "totally unrelated words only here"),
            (2, "q r s t u"),  # exact gram, nothing else
        ],
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in corpusops.decontaminate(df, "text", "doc_id", bench, n=5).collect()
    }
    assert got == {0: (1, True), 1: (0, False), 2: (1, True)}


# --------------------------------------------------------------------------
# Hash sampling
# --------------------------------------------------------------------------


def test_hash_sample_stable_under_repartition(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    kept1 = {
        r["doc_id"]
        for r in df.where(corpusops.hash_keep_col(F.col("doc_id"), 20)).collect()
    }
    kept2 = {
        r["doc_id"]
        for r in df.repartition(13)
        .where(corpusops.hash_keep_col(F.col("doc_id"), 20))
        .collect()
    }
    assert kept1 == kept2
    # rate lands near 20% (md5 is uniform; 500 keys → loose band)
    assert 0.12 <= len(kept1) / 500 <= 0.28


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------


def test_pack_sequences_greedy_and_oversized(spark):
    rows = [
        ("s", 0, 100),
        ("s", 1, 100),
        ("s", 2, 100),  # overflows bin 0 (200+100>256) → bin 1
        ("s", 3, 999),  # oversized: gets bin 2 alone
        ("s", 4, 1),  # 999+1>256 → bin 3
        ("t", 5, 10),  # separate stream restarts at bin 0
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, wc long")
    got = {
        r["doc_id"]: r["bin_id"]
        for r in corpusops.pack_sequences(df, "doc_id", "wc", "source", cap=256).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 0}


def test_pack_sequences_matches_pandas_fold(spark):
    # property-ish check on a pseudorandom-but-deterministic workload
    rows = [("s" + str(i % 3), i, (i * 37) % 200 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "source string, doc_id long, wc long")
    got = {
        (r["source"], r["doc_id"]): r["bin_id"]
        for r in corpusops.pack_sequences(df, "doc_id", "wc", "source", cap=256).collect()
    }
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "wc"])
    want = {}
    for src, g in pdf.groupby("source"):
        fill, b = 10**9, -1
        for _, row in g.sort_values("doc_id").iterrows():
            if fill + row.wc <= 256:
                fill += row.wc
            else:
                b += 1
                fill = row.wc
            want[(src, row.doc_id)] = b
    assert got == want


# --------------------------------------------------------------------------
# Chunk dedup
# --------------------------------------------------------------------------


def test_chunk_dedup_strips_shared_header_keeps_unique(spark):
    header = "h1 h2 h3"
    df = _docs(
        spark,
        [
            (0, header + " unique zero words"),
            (1, header + " other one words"),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in corpusops.chunk_dedup(df, "text", "doc_id", chunk_tokens=3).collect()
    }
    assert got[0]["clean_text"] == "unique zero words"
    assert got[1]["clean_text"] == "other one words"
    assert got[0]["n_chunks"] == 2 and got[0]["n_kept"] == 1


def test_chunk_dedup_empties_exact_duplicate_docs(spark):
    df = _docs(spark, [(0, "a b c d e f"), (1, "a b c d e f"), (2, "x y z")])
    got = {
        r["doc_id"]: r
        for r in corpusops.chunk_dedup(df, "text", "doc_id", chunk_tokens=3).collect()
    }
    assert got[0]["clean_text"] == "" and got[0]["n_kept"] == 0
    assert got[1]["clean_text"] == "" and got[1]["n_kept"] == 0
    assert got[2]["clean_text"] == "x y z" and got[2]["n_kept"] == 1


def test_chunk_dedup_partial_tail_chunk(spark):
    df = _docs(spark, [(0, "a b c d"), (1, "")])
    got = {
        r["doc_id"]: r
        for r in corpusops.chunk_dedup(df, "text", "doc_id", chunk_tokens=3).collect()
    }
    assert got[0]["n_chunks"] == 2  # "a b c" + partial "d"
    assert got[0]["clean_text"] == "a b c d"
    assert got[1]["n_chunks"] == 0 and got[1]["clean_text"] == ""


# --------------------------------------------------------------------------
# URL features
# --------------------------------------------------------------------------


def test_url_feature_cols(spark):
    df = spark.createDataFrame(
        [
            (0, "https://Sub.Example.COM/a/b/c?x=1&y=2#frag"),
            (1, "http://example.org"),
        ],
        "i long, url string",
    )
    f = corpusops.url_feature_cols(F.col("url"))
    got = {
        r["i"]: r
        for r in df.select(
            "i", f["host"].alias("h"), f["tld"].alias("t"),
            f["path_depth"].alias("d"), f["n_params"].alias("p"),
            f["has_fragment"].alias("fr"),
        ).collect()
    }
    assert got[0]["h"] == "sub.example.com"
    assert got[0]["t"] == "com"
    assert (got[0]["d"], got[0]["p"], got[0]["fr"]) == (3, 2, True)
    assert got[1]["h"] == "example.org"
    assert (got[1]["d"], got[1]["p"], got[1]["fr"]) == (0, 0, False)


# --------------------------------------------------------------------------
# Cross-snapshot (incremental) dedup
# --------------------------------------------------------------------------


def test_incremental_new_docs_semantics(spark):
    from crawler_engine_spark.operators import dedup

    old = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup
            (3, "one two three four five six seven eight nine extra"),  # near dup
            (5, "completely different words appear in this document"),  # unique
            (7, "completely different words appear in this document"),  # new-internal dup: kept
        ],
        "doc_id long, text string",
    )
    out = dedup.incremental_new_docs(
        new, old, "text", "doc_id", threshold=0.5, num_perm=64, bands=32
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [5, 7]


def test_lsh_index_merge_equivalence(spark, tmp_path):
    """VERDICT r04 #6 (index lifecycle): merge([a, b]) must be row-set
    identical to an index built over docs_a ∪ docs_b — including when a
    document appears in BOTH snapshots (re-dedup) — must refuse
    parameter-mismatched inputs and in-place output, and must be usable
    as the old_index of an ingest with identical results."""
    from crawler_engine_spark.operators import dedup

    docs_a = [(i, f"snapshot a document {i} shared words {i % 5}")
              for i in range(10)]
    docs_b = [(100 + i, f"snapshot b document {i} other words {i % 4}")
              for i in range(8)]
    a = spark.createDataFrame(docs_a, "doc_id long, text string")
    # snapshot b re-contains one of a's documents verbatim
    b = spark.createDataFrame(docs_b + [docs_a[7]], "doc_id long, text string")
    pa, pb, pm, pu = (str(tmp_path / n) for n in ("a", "b", "m", "u"))
    dedup.write_lsh_index(a, pa, "text", "doc_id")
    dedup.write_lsh_index(b, pb, "text", "doc_id")
    params = dedup.merge_lsh_index(spark, [pa, pb], pm)
    assert params["num_perm"] == 64 and params["id_col"] == "doc_id"

    dedup.write_lsh_index(a.union(b).distinct(), pu, "text", "doc_id")
    merged, union_idx = (dedup.read_lsh_index(spark, p) for p in (pm, pu))
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(merged.banded) == key(union_idx.banded)
    assert key(merged.digests) == key(union_idx.digests)

    new = spark.createDataFrame(
        [(500, docs_b[3][1]),  # exact dup of the b side
         (501, "entirely fresh content that matches no snapshot at all")],
        "doc_id long, text string",
    )
    both = a.union(b).distinct()
    via_merged = dedup.incremental_new_docs(
        new, both, "text", "doc_id", threshold=0.5, old_index=merged
    )
    via_union = dedup.incremental_new_docs(
        new, both, "text", "doc_id", threshold=0.5, old_index=union_idx
    )
    assert (
        sorted(r["doc_id"] for r in via_merged.collect())
        == sorted(r["doc_id"] for r in via_union.collect())
        == [501]
    )

    import pytest as _pytest

    pc = str(tmp_path / "c")
    dedup.write_lsh_index(a, pc, "text", "doc_id", num_perm=32, bands=8)
    with _pytest.raises(ValueError, match="params"):
        dedup.merge_lsh_index(spark, [pa, pc], str(tmp_path / "x"))
    with _pytest.raises(ValueError, match="inputs"):
        dedup.merge_lsh_index(spark, [pa, pb], pa)
    with _pytest.raises(ValueError, match="at least two"):
        dedup.merge_lsh_index(spark, [pa], str(tmp_path / "y"))
    # r05 review: a symlink aliasing the output must be caught (realpath,
    # not string compare) — otherwise the overwrite destroys its own input
    import os as _os

    plink = str(tmp_path / "a_link")
    _os.symlink(pa, plink)
    with _pytest.raises(ValueError, match="inputs"):
        dedup.merge_lsh_index(spark, [plink, pb], pa)
    # and URI-scheme paths can't be identity-checked (or marker-read) by
    # the local-filesystem index IO — refuse, don't mis-compare
    with _pytest.raises(ValueError, match="local"):
        dedup.merge_lsh_index(spark, [pa, "s3://bucket/idx"], pm)


def test_lsh_index_rewrite_crash_leaves_no_readable_index(spark, tmp_path, monkeypatch):
    """The written-LAST crash-safety rule must hold when writing OVER an
    existing index: the old ``_INDEX`` marker is removed before any data
    write, so a crash mid-rewrite/mid-merge leaves the path unreadable
    (read_lsh_index raises) instead of an old marker presiding over a
    new/old parquet mix.  An INVALID merge, by contrast, must not touch
    a valid index already at ``out``."""
    import os

    import pytest as _pytest

    from crawler_engine_spark.operators import dedup

    a = spark.createDataFrame(
        [(i, f"crash safety document {i}") for i in range(6)],
        "doc_id long, text string",
    )
    p = str(tmp_path / "idx")
    dedup.write_lsh_index(a, p, "text", "doc_id")
    assert os.path.exists(os.path.join(p, "_INDEX"))

    # crash during the data write of an in-place rewrite
    boom = RuntimeError("simulated crash mid-write")
    real = dedup.minhash_banded

    def exploding(*args, **kwargs):
        raise boom

    monkeypatch.setattr(dedup, "minhash_banded", exploding)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        dedup.write_lsh_index(a, p, "text", "doc_id")
    monkeypatch.setattr(dedup, "minhash_banded", real)
    # marker gone -> the half-written index is not readable
    with _pytest.raises(FileNotFoundError):
        dedup.read_lsh_index(spark, p)

    # rewrite completes -> readable again
    dedup.write_lsh_index(a, p, "text", "doc_id")
    assert dedup.read_lsh_index(spark, p).params["id_col"] == "doc_id"

    # an invalid merge rejected at validation must NOT invalidate `out`
    pq = str(tmp_path / "other")
    dedup.write_lsh_index(a, pq, "text", "doc_id", num_perm=32, bands=8)
    with _pytest.raises(ValueError, match="params"):
        dedup.merge_lsh_index(spark, [pq, p], str(tmp_path / "out2"))
    assert dedup.read_lsh_index(spark, p).params["num_perm"] == 64


def test_lsh_index_skips_old_side_signatures(spark, tmp_path):
    """Two successive ingest batches against ONE written index: results
    match the recompute path exactly, and the plan proves the old side is
    never re-signed — with the index, exactly one `minhash` UDF node (the
    new side) appears; the recompute path has two."""
    from crawler_engine_spark.operators import dedup

    old = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    idx_path = str(tmp_path / "lsh_index")
    dedup.write_lsh_index(old, idx_path, "text", "doc_id", num_perm=64, bands=32)
    idx = dedup.read_lsh_index(spark, idx_path)
    assert idx.params["num_perm"] == 64 and idx.params["bands"] == 32

    batches = [
        spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta"),  # exact
                (5, "completely different words appear in this document"),
            ],
            "doc_id long, text string",
        ),
        spark.createDataFrame(
            [
                (3, "one two three four five six seven eight nine extra"),  # near
                (9, "yet another entirely unrelated batch two document here"),
            ],
            "doc_id long, text string",
        ),
    ]
    # per batch: surviving ids after the final near-dup filter, and how many
    # docs survive the DIGEST anti-join (only those pay for signatures —
    # batch 1's doc 1 is an exact dup and is dropped before any signing)
    expected = [([5], 1), ([9], 2)]
    for new, (want, n_signed) in zip(batches, expected):
        # UDF-call counter: rides the minhash closure to the workers
        acc = spark.sparkContext.accumulator(0)
        dedup.MINHASH_CALL_COUNTER = acc
        try:
            via_index = dedup.incremental_new_docs(
                new, old, "text", "doc_id", threshold=0.5, old_index=idx
            )
            assert sorted(r["doc_id"] for r in via_index.collect()) == want
            # zero old-side signature recomputation: only the new batch's
            # digest-surviving docs sign
            assert acc.value == n_signed, acc.value

            acc2 = spark.sparkContext.accumulator(0)
            dedup.MINHASH_CALL_COUNTER = acc2
            recomputed = dedup.incremental_new_docs(
                new, old, "text", "doc_id", threshold=0.5, num_perm=64, bands=32
            )
            assert sorted(r["doc_id"] for r in recomputed.collect()) == want
            assert acc2.value == n_signed + old.count()  # old side re-signed
        finally:
            dedup.MINHASH_CALL_COUNTER = None

    # an unreadable / uncommitted index fails fast
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        dedup.read_lsh_index(spark, str(tmp_path / "nope"))


def test_cross_snapshot_candidates_never_pair_within_side(spark):
    from crawler_engine_spark.operators import dedup

    # two identical docs on the same side must NOT pair with each other
    old = spark.createDataFrame([(0, "x y z w v u t s")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "x y z w v u t s"), (3, "x y z w v u t s")], "doc_id long, text string"
    )
    pairs = dedup.cross_snapshot_candidates(new, old, "text", "doc_id").collect()
    assert sorted((r["id_new"], r["id_old"]) for r in pairs) == [(1, 0), (3, 0)]


# --------------------------------------------------------------------------
# Streaming corpus filter
# --------------------------------------------------------------------------


def test_stream_corpus_filter_matches_batch(spark, tmp_path):
    from crawler_engine_spark.data.gen import gen_pages_df
    from crawler_engine_spark.operators import corpusops
    from crawler_engine_spark.operators.extraction import extract_pages
    from crawler_engine_spark.operators.textstats import (
        lang_id_col,
        quality_score_col,
    )
    from crawler_engine_spark.streaming.pipeline import stream_corpus_filter

    pages_dir = str(tmp_path / "pages")
    gen_pages_df(spark, 40, partitions=2).write.parquet(pages_dir)

    q = stream_corpus_filter(
        spark,
        pages_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        min_quality=0.3,
    )
    q.awaitTermination(120)

    got = {
        (r["url"], r["lang_pred"], r["quality"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    res = extract_pages(spark.read.parquet(pages_dir), mode="structured")
    want_df = (
        res.withColumn("lang_pred", lang_id_col(F.col("content")))
        .withColumn("quality", F.round(quality_score_col(F.col("content")), 4))
        .where((F.col("lang_pred") == "en") & (F.col("quality") >= 0.3))
        .withColumn("content", corpusops.redact_pii_col(F.col("content")))
    )
    want = {
        (r["url"], r["lang_pred"], r["quality"]) for r in want_df.collect()
    }
    assert got == want and len(got) > 0


# --------------------------------------------------------------------------
# Capped (per-stratum) sampling
# --------------------------------------------------------------------------


def test_capped_sample_binds_and_is_stable(spark):
    rows = [(i, "s" + str(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    kept1 = sorted(
        r["doc_id"]
        for r in corpusops.capped_sample(df, "doc_id", ["stratum"], cap=5).collect()
    )
    assert len(kept1) == 10  # 2 strata × 5
    kept2 = sorted(
        r["doc_id"]
        for r in corpusops.capped_sample(
            df.repartition(7), "doc_id", ["stratum"], cap=5
        ).collect()
    )
    assert kept1 == kept2  # hash-rank selection is partitioning-invariant
    # small stratum passes through untouched
    small = spark.createDataFrame([(0, "x"), (1, "x")], "doc_id long, stratum string")
    assert corpusops.capped_sample(small, "doc_id", ["stratum"], cap=5).count() == 2


def test_capped_sample_giant_stratum_bounded(spark):
    """The hot-stratum guard (mirror of the salted-politeness reducer-bound
    test): a 200k-row stratum must reach the ranking window pre-cut to
    ~giant_factor·cap rows, and the guarded output must equal the plain
    unguarded window's selection exactly."""
    from pyspark.sql import Window

    rows = [(i, "hot" if i < 200_000 else "cold") for i in range(200_050)]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    cap, gf = 10, 8

    pre = corpusops._capped_prefiltered(df, "doc_id", ["stratum"], cap, gf)
    per_stratum = {
        r["stratum"]: r["n"]
        for r in pre.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    # expected survivors ≈ gf·cap + 16 = 96; bound the reducer at 4× that
    assert per_stratum["hot"] <= 4 * (gf * cap + 16), per_stratum
    assert per_stratum["hot"] >= cap  # superset certificate holds
    assert per_stratum["cold"] == 50  # non-giant strata untouched

    got = sorted(
        r["doc_id"]
        for r in corpusops.capped_sample(df, "doc_id", ["stratum"], cap, gf).collect()
    )
    # unguarded reference: the plain window over the full input
    h = corpusops._rank_hash_col("doc_id")
    w = Window.partitionBy("stratum").orderBy(h.asc(), F.col("doc_id").asc())
    want = sorted(
        r["doc_id"]
        for r in df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .collect()
    )
    assert got == want and len(got) == 2 * cap


# --------------------------------------------------------------------------
# CLI corpus funnel
# --------------------------------------------------------------------------


def test_cli_corpus_funnel(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(docs)
    out = str(tmp_path / "clean")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "crawl.py"), "corpus",
         "--docs", docs, "--out", out,
         "--ops", "lang,quality,exact_dedup,boilerplate,keywords,pii,cap",
         "--strata", "lang,source", "--cap", "3", "--min-quality", "0.3",
         "--keywords-k", "2"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    s = rec["stats"]
    # funnel is monotone non-increasing and every stage reported
    order = ["input", "lang", "quality", "exact_dedup", "boilerplate",
             "keywords", "pii", "cap"]
    assert list(s) == order
    vals = [s[k] for k in order]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert vals[-1] > 0
    got = spark.read.parquet(out)
    assert got.count() == vals[-1]
    assert "quality" in got.columns and "lang_pred" in got.columns
    # keywords annotation survives later filter stages, max k entries
    assert all(
        len(r["keywords"]) <= 2 for r in got.select("keywords").collect()
    )


def test_cli_index_then_incremental_ingest(spark, tmp_path):
    """crawl.py index + corpus --ops incremental --old-index: the ingest
    batch keeps only docs that are neither exact nor near dups of the old
    snapshot, using the written index (no old-side re-signing)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old = str(tmp_path / "old")
    spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    ).write.parquet(old)
    new = str(tmp_path / "new")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup
            (3, "one two three four five six seven eight nine extra"),  # near
            (5, "completely different words appear in this document"),
        ],
        "doc_id long, text string",
    ).write.parquet(new)
    idx = str(tmp_path / "idx")
    p1 = subprocess.run(
        [sys.executable, os.path.join(repo, "crawl.py"), "index",
         "--docs", old, "--out", idx, "--num-perm", "64", "--bands", "32"],
        capture_output=True, text=True, timeout=600,
    )
    assert p1.returncode == 0, p1.stderr[-2000:]
    assert os.path.exists(os.path.join(idx, "_INDEX"))
    out = str(tmp_path / "ingested")
    p2 = subprocess.run(
        [sys.executable, os.path.join(repo, "crawl.py"), "corpus",
         "--docs", new, "--out", out, "--ops", "incremental",
         "--old-docs", old, "--old-index", idx, "--jaccard", "0.5"],
        capture_output=True, text=True, timeout=600,
    )
    assert p2.returncode == 0, p2.stderr[-2000:]
    rec = json.loads([l for l in p2.stdout.splitlines() if l.startswith("{")][-1])
    assert rec["stats"] == {"input": 3, "incremental": 1}
    assert [r["doc_id"] for r in spark.read.parquet(out).collect()] == [5]


def test_cli_flag_validation_fails_fast():
    """r05 review: `index --merge` must reject signature-param flags it
    would otherwise silently ignore (merge params come from the stored
    indexes), and `ingest --max-slice-bytes <= 0` must error instead of
    classifying every listing row as malformed and writing an empty page
    store with exit code 0.  Both checks run before JVM startup, so these
    subprocesses are cheap."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    crawl = os.path.join(repo, "crawl.py")
    p = subprocess.run(
        [sys.executable, crawl, "index", "--merge", "a,b", "--out", "/tmp/x",
         "--num-perm", "128"],
        capture_output=True, text=True, timeout=120,
    )
    assert p.returncode != 0 and "--num-perm" in p.stderr
    p = subprocess.run(
        [sys.executable, crawl, "ingest", "--cdx", "/tmp/nonexistent.cdxj",
         "--out", "/tmp/x", "--max-slice-bytes", "0"],
        capture_output=True, text=True, timeout=120,
    )
    assert p.returncode != 0 and "--max-slice-bytes" in p.stderr


# --------------------------------------------------------------------------
# Unicode normalization
# --------------------------------------------------------------------------


def test_make_normalize_udf_nfc_controls_whitespace(spark):
    df = spark.createDataFrame(
        [
            (0, "café  x"),          # decomposed acute → é, double space
            (1, "a\x01b\tc"),              # control stripped, tab collapsed
            (2, None),                      # null passthrough
            (3, "  already clean  "),      # trim only
        ],
        "doc_id long, text string",
    )
    norm = corpusops.make_normalize_udf("NFC")(F.col("text"))
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", norm.alias("n")).collect()}
    assert got[0] == "café x"
    assert got[1] == "ab c"
    assert got[2] is None
    assert got[3] == "already clean"


def test_pii_counts_match_redactions_on_overlap(spark):
    # '1.2.3.444-555-6666': phone pass consumes the span → 0 IPs redacted,
    # and counts must agree with the placeholders actually emitted
    df = _docs(spark, [(0, "x 1.2.3.444-555-6666 y")])
    counts = corpusops.pii_counts(F.col("text"))
    r = df.select(
        corpusops.redact_pii_col(F.col("text")).alias("red"),
        counts["n_phones"].alias("p"), counts["n_ips"].alias("i"),
    ).collect()[0]
    assert r["red"].count("<PHONE>") == r["p"] == 1
    assert r["red"].count("<IP>") == r["i"] == 0


def test_pack_sequences_int_stream_key_and_string_id(spark):
    rows = [(7, "a", 100), (7, "b", 100), (7, "c", 100), (9, "d", 50)]
    df = spark.createDataFrame(rows, "shard int, name string, wc long")
    got = {
        (r["shard"], r["name"]): r["bin_id"]
        for r in corpusops.pack_sequences(df, "name", "wc", "shard", cap=256).collect()
    }
    assert got == {(7, "a"): 0, (7, "b"): 0, (7, "c"): 1, (9, "d"): 0}


def test_url_feature_host_strips_userinfo_and_port(spark):
    df = spark.createDataFrame(
        [(0, "https://alice@Example.com:8443/p?x=1")], "i long, url string"
    )
    f = corpusops.url_feature_cols(F.col("url"))
    r = df.select(f["host"].alias("h"), f["tld"].alias("t")).collect()[0]
    assert r["h"] == "example.com" and r["t"] == "com"


def test_stream_exact_dedup_digest_set_matches_batch(spark, tmp_path):
    from crawler_engine_spark.data.gen import gen_pages_df
    from crawler_engine_spark.streaming.pipeline import stream_exact_dedup

    pages_dir = str(tmp_path / "pages")
    base = gen_pages_df(spark, 30, partitions=2)
    # write twice: second batch re-delivers identical content (recrawl)
    base.write.parquet(pages_dir)
    base.write.mode("append").parquet(pages_dir)

    q = stream_exact_dedup(
        spark, pages_dir, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        r["digest"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        r["digest"]
        for r in spark.read.parquet(pages_dir)
        .select(F.md5("text").alias("digest"))
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0
    # stream emitted exactly one row per digest despite the duplicate batch
    n_rows = spark.read.parquet(str(tmp_path / "out")).count()
    assert n_rows == len(want)


def test_stream_exact_dedup_within_watermark(spark, tmp_path):
    """The bounded-state continuous-mode variant: duplicates arriving
    within the watermark horizon are dropped just like the unbounded
    path, and the plan carries the watermark + within-watermark dedup
    operator (evictable state) instead of plain dropDuplicates."""
    from crawler_engine_spark.data.gen import gen_pages_df
    from crawler_engine_spark.streaming.pipeline import stream_exact_dedup

    pages_dir = str(tmp_path / "pages")
    base = gen_pages_df(spark, 20, partitions=2)
    base.write.parquet(pages_dir)
    base.write.mode("append").parquet(pages_dir)  # in-horizon recrawl

    q = stream_exact_dedup(
        spark, pages_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        within_watermark="1 hour",
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    want = spark.read.parquet(pages_dir).select(
        F.md5("text").alias("digest")
    ).distinct().count()
    assert out.count() == want
    # the state operator is the within-watermark variant
    lp = q.lastProgress
    ops = [o["operatorName"] for o in lp["stateOperators"]]
    assert ops == ["dedupeWithinWatermark"], ops


# --------------------------------------------------------------------------
# Host-scoped boilerplate removal / duplicated-span analysis
# --------------------------------------------------------------------------


def test_boilerplate_chunks_is_source_scoped(spark):
    """A chunk shared by >=3 docs of ONE source is stripped there, but the
    identical chunk on a 2-doc source survives — and a chunk repeated twice
    inside a single doc is not boilerplate (distinct-doc count is 1)."""
    from crawler_engine_spark.operators.corpusops import boilerplate_chunks

    foot = "nav home about contact terms privacy login search help footer"
    rows = [
        (1, "a", f"{foot} alpha words one two three four five six seven"),
        (2, "a", f"{foot} beta words one two three four five six eight"),
        (3, "a", f"{foot} gamma words one two three four five six nine"),
        (4, "b", f"{foot} delta words one two three four five six ten"),
        (5, "b", f"{foot} epsilon words one two three four five six more"),
        # doc 6: same 10-token chunk twice within ONE doc of source c
        (6, "c", f"{foot} {foot}"),
    ]
    out = {
        r["doc_id"]: r
        for r in boilerplate_chunks(
            spark.createDataFrame(rows, "doc_id long, source string, text string"),
            "text", "doc_id", "source", chunk_tokens=10, min_docs=3,
        ).collect()
    }
    # source a (3 docs): footer chunk stripped, the prose chunk kept
    for i in (1, 2, 3):
        assert out[i]["n_chunks"] == 2 and out[i]["n_kept"] == 1
        assert not out[i]["clean_text"].startswith("nav home")
    # source b (2 docs < min_docs): footer survives
    for i in (4, 5):
        assert out[i]["n_kept"] == 2
        assert out[i]["clean_text"].startswith("nav home")
    # within-doc repetition alone is not boilerplate
    assert out[6]["n_kept"] == 2 and out[6]["clean_text"] == f"{foot} {foot}"


def test_duplicate_ngrams_total_order_and_short_docs(spark):
    """Cross-doc 5-grams rank by (n_docs, n_occurrences, ngram); docs
    shorter than n contribute nothing (the sequence() descending trap)."""
    from crawler_engine_spark.operators.corpusops import duplicate_ngrams

    meme = "all your base are belong"
    rows = [
        (1, f"{meme} to us {meme} to us"),  # meme twice in one doc
        (2, f"{meme} to everyone here today"),
        (3, f"{meme} to nobody in particular"),
        (4, "tiny doc"),  # < 5 tokens: no grams at all
        (5, "completely unrelated prose with many novel words inside"),
    ]
    got = duplicate_ngrams(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "text", "doc_id", n=5, min_docs=2, top_k=10,
    ).collect()
    assert got, "expected duplicated n-grams"
    top = got[0]
    assert top["ngram"] == meme
    assert top["n_docs"] == 3 and top["n_occurrences"] == 4
    # descending reach, ties broken by occurrences then lexicographic
    keys = [(-r["n_docs"], -r["n_occurrences"], r["ngram"]) for r in got]
    assert keys == sorted(keys)
    assert all("tiny" not in r["ngram"] for r in got)


def test_dup_span_stats_fractions_and_keep(spark):
    """Exact per-doc duplicated-span fractions: full copies score 1.0 and
    drop; partial overlap scores the exact window fraction; within-doc
    repetition alone does not count as duplication; short docs get 0/0."""
    from crawler_engine_spark.operators.corpusops import dup_span_stats

    w = [f"w{i}" for i in range(16)]
    full = " ".join(w)                      # 16 tokens -> 9 spans of 8
    rows = [
        (1, full),
        (2, full),                          # exact copy of 1: all dup
        (3, " ".join(w[:8]) + " x1 x2 x3 x4 x5 x6 x7 x8"),  # shares 1 span
        (4, "too short for spans"),          # < 8 tokens
        (5, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),  # self-rep
    ]
    out = {
        r["doc_id"]: r
        for r in dup_span_stats(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "text", "doc_id", n=8, max_dup_fraction=0.5,
        ).collect()
    }
    assert out[1]["n_spans"] == 9 and out[1]["dup_fraction"] == 1.0
    assert out[1]["keep"] is False and out[2]["keep"] is False
    assert out[3]["n_spans"] == 9 and out[3]["n_dup"] == 1
    assert out[3]["dup_fraction"] == round(1 / 9, 4) and out[3]["keep"] is True
    assert out[4]["n_spans"] == 0 and out[4]["dup_fraction"] == 0.0
    assert out[4]["keep"] is True
    # doc 5 repeats its own 8-gram but no OTHER doc shares it
    assert out[5]["n_dup"] == 0 and out[5]["keep"] is True
