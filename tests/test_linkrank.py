"""PageRank: exactness against an independent pure-Python integer power
iteration, structural sanity (hubs outrank leaves; dangling nodes leak),
and the budget-feedback hook."""

from pyspark.sql import functions as F

from crawler_engine_spark.operators.linkrank import (
    anchor_summary,
    apply_link_rank,
    hits,
    pagerank,
)

SCALE = 10**12


def _py_pagerank(edges, iterations=10, scale=SCALE, damping=85, teleport=None):
    """Independent replica: same integer semantics, plain dicts."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    tset = set(nodes) if teleport is None else set(teleport) & set(nodes)
    n = len(tset)
    init = scale // n
    base = (15 * init) // 100
    od = {}
    for u, _ in e:
        od[u] = od.get(u, 0) + 1
    r = {v: init if v in tset else 0 for v in nodes}
    for _ in range(iterations):
        contrib = {}
        for u, v in e:
            contrib[v] = contrib.get(v, 0) + r[u] // od[u]
        r = {
            v: (base if v in tset else 0)
            + (damping * contrib.get(v, 0)) // 100
            for v in nodes
        }
    return r


def _mixed_graph():
    # hub node 0 referenced by everyone; a chain; a dangling sink; a
    # self-loop; parallel edge (1->0 twice) that must collapse
    return [
        (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (1, 0),
        (0, 1), (1, 2), (2, 3), (3, 4),
        (5, 6),          # 6 is dangling (no out-edges): leaks mass
        (7, 7), (7, 0),  # self-loop
    ]


def test_pagerank_matches_pure_python_exactly(spark):
    edges = _mixed_graph()
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank(
            spark.createDataFrame(edges, "src long, dst long"), iterations=10
        ).collect()
    }
    want = _py_pagerank(edges, iterations=10)
    assert got == want  # bit-exact, not approximately


def test_pagerank_structure(spark):
    edges = _mixed_graph()
    df = pagerank(spark.createDataFrame(edges, "src long, dst long"))
    rows = {r["node"]: r for r in df.collect()}
    assert set(rows) == set(range(8))
    # the hub out-ranks every leaf
    hub = rows[0]["rank_micro"]
    assert all(hub > rows[v]["rank_micro"] for v in (4, 5, 6, 7))
    # mass leaks at the dangling sink: total < scale
    assert sum(r["rank_micro"] for r in rows.values()) < SCALE
    # rank column is micro/scale rounded
    for r in rows.values():
        assert r["rank"] == round(r["rank_micro"] / SCALE, 8)


def test_pagerank_empty_and_null_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0
    withnull = spark.createDataFrame(
        [(1, 2), (None, 3), (2, None)], "src long, dst long"
    )
    got = {r["node"] for r in pagerank(withnull).collect()}
    assert got == {1, 2}  # null endpoints dropped entirely


def test_apply_link_rank_scales_budgets(spark):
    ranks = spark.createDataFrame(
        [("big.example", 400_000), ("small.example", 0)],
        "host string, rank_micro long",
    )
    frontier = spark.createDataFrame(
        [("big.example", 10), ("small.example", 10), ("unknown.example", 10)],
        "host string, host_budget int",
    )
    out = {
        r["host"]: r["host_budget"]
        for r in apply_link_rank(frontier, ranks).collect()
    }
    assert out["big.example"] == 20      # max rank -> 2.0x
    assert out["small.example"] == 5     # rank 0 -> 0.5x
    assert out["unknown.example"] == 5   # absent -> rank 0
    # liveness floor
    tiny = spark.createDataFrame(
        [("small.example", 1)], "host string, host_budget int"
    )
    assert apply_link_rank(tiny, ranks).first()["host_budget"] == 1


def _py_hits(edges, iterations=5, scale=10**9):
    """Independent integer-HITS replica: same floor normalization."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    init = scale // len(nodes)
    h = {v: init for v in nodes}
    a = {v: init for v in nodes}
    for _ in range(iterations):
        ap = {v: 0 for v in nodes}
        for u, v in e:
            ap[v] += h[u]
        s = max(sum(ap.values()) // scale, 1)
        a = {v: ap[v] // s for v in nodes}
        hp = {v: 0 for v in nodes}
        for u, v in e:
            hp[u] += a[v]
        s = max(sum(hp.values()) // scale, 1)
        h = {v: hp[v] // s for v in nodes}
    return h, a


def test_hits_matches_pure_python_exactly(spark):
    edges = _mixed_graph()
    rows = {
        r["node"]: r
        for r in hits(
            spark.createDataFrame(edges, "src long, dst long"), iterations=5
        ).collect()
    }
    h, a = _py_hits(edges, iterations=5)
    assert {k: r["hub_micro"] for k, r in rows.items()} == h
    assert {k: r["auth_micro"] for k, r in rows.items()} == a
    for r in rows.values():
        # float columns are cosmetic; Spark rounds HALF_UP, Python's
        # round() banker's — they differ by one ulp exactly at .5 points
        assert abs(r["hub"] - r["hub_micro"] / 10**9) <= 5e-9
        assert abs(r["auth"] - r["auth_micro"] / 10**9) <= 5e-9


def test_hits_reliable_materialization_identical(spark, tmp_path):
    """materialize='reliable' (half-steps written to parquet instead of
    localCheckpoint — executor-loss-safe, VERDICT r03 #5) is bit-identical
    to the local mode and actually writes per-step state."""
    import os

    edges = spark.createDataFrame(_mixed_graph(), "src long, dst long")
    local = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits(edges, iterations=3).collect()
    }
    scratch = str(tmp_path / "hits_scratch")
    reliable = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits(
            edges, iterations=3, materialize="reliable", scratch_dir=scratch
        ).collect()
    }
    assert reliable == local
    # 2 cuts per half-step x 2 half-steps x 3 iterations + the final out
    assert len([d for d in os.listdir(scratch) if d.startswith("step_")]) == 13


def test_hits_structure_directory_vs_authority(spark):
    """A directory node pointing at every authority gets the top hub
    score and zero authority; the most-cited node gets the top authority
    score; an isolated citer/citee pair stays low on both."""
    edges = (
        [(100, v) for v in (1, 2, 3, 4)]   # 100 = pure directory/hub
        + [(u, 1) for u in (2, 3, 4)]      # 1 = most-cited authority
        + [(50, 51)]                       # side pair
    )
    rows = {
        r["node"]: r
        for r in hits(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    top_hub = max(rows.values(), key=lambda r: r["hub_micro"])["node"]
    top_auth = max(rows.values(), key=lambda r: r["auth_micro"])["node"]
    assert top_hub == 100 and top_auth == 1
    assert rows[100]["auth_micro"] == 0  # nothing cites the directory
    assert rows[51]["hub_micro"] == 0    # the sink cites nothing
    assert hits(spark.createDataFrame([], "src long, dst long")).count() == 0


def test_personalized_pagerank_matches_pure_python_exactly(spark):
    """Teleport restricted to {0, 5}: bit-exact vs the replica, including
    a teleport entry (99) absent from the graph (ignored for |S|)."""
    edges = _mixed_graph()
    tele = spark.createDataFrame([(0,), (5,), (99,)], "node long")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank(
            spark.createDataFrame(edges, "src long, dst long"),
            iterations=10, teleport=tele,
        ).collect()
    }
    want = _py_pagerank(edges, iterations=10, teleport=[0, 5, 99])
    assert got == want


def test_personalized_pagerank_focuses_mass_near_seeds(spark):
    """Two disconnected 2-cycles; teleporting into one of them leaves the
    other at exactly zero mass — the focused-crawl property."""
    edges = [(1, 2), (2, 1), (10, 11), (11, 10)]
    tele = spark.createDataFrame([(1,)], "node long")
    rows = {
        r["node"]: r["rank_micro"]
        for r in pagerank(
            spark.createDataFrame(edges, "src long, dst long"), teleport=tele
        ).collect()
    }
    assert set(rows) == {1, 2, 10, 11}
    assert rows[1] > 0 and rows[2] > 0
    assert rows[10] == rows[11] == 0


_LINKS_SCHEMA = "url string, links array<struct<href:string,text:string>>"


def test_anchor_summary_resolution_and_aggregation(spark):
    rows = [
        # absolute kept; root-relative resolved against the source's
        # scheme+authority; mailto/js/tel and empty hrefs skipped
        ("https://a.example/p1", [
            ("https://t.example/x", "Target  Page"),   # ws-normalized
            ("/local", "home"),
            ("mailto:x@example.com", "skipped"),
            ("javascript:void(0)", "skipped"),
            ("#frag", "skipped"),  # fragment-only = self-reference
            ("", "skipped"),
        ]),
        ("https://a.example/p2", [("https://t.example/x", "target page")]),
        ("https://b.example/p1", [
            ("https://t.example/x", "Target  Page"),
            ("https://t.example/x", ""),               # counts, no text
        ]),
    ]
    out = {
        r["target"]: r
        for r in anchor_summary(
            spark.createDataFrame(rows, _LINKS_SCHEMA)
        ).collect()
    }
    assert set(out) == {"https://t.example/x", "https://a.example/local"}
    t = out["https://t.example/x"]
    assert t["n_refs"] == 4 and t["n_hosts"] == 2
    # "Target Page" (2 refs, normalized) beats "target page" (1 ref);
    # the empty-text ref is counted in n_refs but never ranked
    assert t["top_texts"] == ["Target Page", "target page"]
    local = out["https://a.example/local"]
    assert local["n_refs"] == 1 and local["n_hosts"] == 1
    assert local["top_texts"] == ["home"]


def test_anchor_summary_full_urljoin(spark):
    """VERDICT r03 #3: document-relative hrefs (the majority of intra-site
    links on real pages) must aggregate to their urljoin-resolved canonical
    targets — same semantics as the out_links kernel — while the
    absolute/root-relative fast path stays JVM-only."""
    rows = [
        ("https://a.example/d/p1", [
            ("../u/5", "up five"),          # dot-segment resolution
            ("b.html", "sibling"),          # directory-relative
            ("./c", "dot slash"),
            ("//cdn.example/x", "proto"),   # protocol-relative (JVM path)
            ("?q=1", "query only"),
        ]),
        ("https://b.example/d/sub/p2", [
            ("../u/5", "up five"),          # resolves to /d/u/5, NOT /u/5
        ]),
    ]
    out = {
        r["target"]: r
        for r in anchor_summary(
            spark.createDataFrame(rows, _LINKS_SCHEMA)
        ).collect()
    }
    assert out["https://a.example/u/5"]["top_texts"] == ["up five"]
    assert out["https://a.example/d/b.html"]["top_texts"] == ["sibling"]
    assert out["https://a.example/d/c"]["top_texts"] == ["dot slash"]
    assert out["https://cdn.example/x"]["top_texts"] == ["proto"]
    assert out["https://b.example/d/u/5"]["top_texts"] == ["up five"]
    # query-only href resolves against the base path
    assert any(t.startswith("https://a.example/d/p1") for t in out)


def test_anchor_summary_topk_order_and_ties(spark):
    links = (
        [("https://t.example/", "common")] * 3
        + [("https://t.example/", "beta")] * 2
        + [("https://t.example/", "alpha")] * 2
        + [("https://t.example/", "rare")]
    )
    rows = [("https://s.example/p", links)]
    row = anchor_summary(
        spark.createDataFrame(rows, _LINKS_SCHEMA), top_k=3
    ).first()
    # count desc, then text asc on the tie; top_k caps out "rare"
    assert row["top_texts"] == ["common", "alpha", "beta"]
    assert row["n_refs"] == 8 and row["n_hosts"] == 1


def test_release_caches_exact_object_and_registry(spark):
    """ADVICE r04: release_caches(df) only works on the EXACT returned
    object (transformations drop the handle attribute); release_caches()
    with no argument must release every registered internal persist
    regardless — and anchor_summary's internal caches must not outlive
    the call beyond the single pre-agg handle it hands back."""
    from pyspark.storagelevel import StorageLevel

    from crawler_engine_spark.operators import linkrank

    edges = spark.createDataFrame(_mixed_graph(), "src long, dst long")
    out = pagerank(edges, iterations=2)
    handles = out._linkrank_caches
    assert len(handles) == 2
    assert all(h.storageLevel != StorageLevel.NONE for h in handles)
    transformed = out.select("node")  # attribute does NOT survive this
    assert not hasattr(transformed, "_linkrank_caches")
    linkrank.release_caches(transformed)  # legacy form: silent no-op
    assert all(h.storageLevel != StorageLevel.NONE for h in handles)
    linkrank.release_caches()  # registry form: releases regardless
    assert all(h.storageLevel == StorageLevel.NONE for h in handles)

    rows = [("https://a.example/p", [("https://t.example/x", "t"),
                                     ("rel/doc.html", "r")])]
    out = anchor_summary(spark.createDataFrame(rows, _LINKS_SCHEMA))
    (g1_all,) = out._linkrank_caches
    assert g1_all.storageLevel != StorageLevel.NONE
    got = out.collect()
    assert {r["target"] for r in got} == {
        "https://t.example/x", "https://a.example/rel/doc.html"
    }
    linkrank.release_caches(out)  # exact object: releases the handle
    assert g1_all.storageLevel == StorageLevel.NONE
    # the exploded projection was released inside anchor_summary already:
    # nothing this module registered is still persisted
    assert not linkrank._REGISTERED_CACHES


def test_pagerank_checkpoint_cadence_is_result_identical(spark):
    edges = spark.createDataFrame(_mixed_graph(), "src long, dst long")
    plain = {r["node"]: r["rank_micro"] for r in pagerank(edges).collect()}
    cut = {
        r["node"]: r["rank_micro"]
        for r in pagerank(edges, checkpoint_every=3).collect()
    }
    assert plain == cut
