"""Tests for the training-data pipeline operators (dedup / similarity /
textstats / multimodal) over the driver-provided documents & embeddings
tables plus synthetic fixtures."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_engine_spark.operators import dedup, multimodal, similarity, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ------------------------------------------------------------------- dedup


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["a", "b", "a", "a"]})
    )
    kept = dedup.exact_dedup(df, "text", "doc_id").collect()
    assert sorted((r["doc_id"], r["dup_count"]) for r in kept) == [(1, 3), (2, 1)]
    groups = dedup.exact_dup_groups(df, "text", "doc_id").collect()
    assert len(groups) == 1 and groups[0]["dup_count"] == 3


def test_minhash_finds_near_duplicates(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "through fields of green grass under a bright blue summer sky today"
    )
    near = base.replace("bright blue", "dark grey")  # high jaccard
    other = "completely different content about spark shuffle partitions and joins in distributed systems everywhere"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, other]})
    )
    # r = num_perm/bands = 2 → band-collision prob ≈ 1-(1-J²)³² ≈ 1 at J=0.7
    pairs = dedup.minhash_lsh_candidates(df, "text", "doc_id", num_perm=64, bands=32)
    verified = dedup.verify_jaccard(pairs, df, "text", "doc_id", threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in verified] == [(1, 2)]
    deduped = dedup.minhash_dedup(df, "text", "doc_id", threshold=0.5, num_perm=64, bands=32)
    assert sorted(r["doc_id"] for r in deduped.collect()) == [1, 3]


def test_minhash_self_join_signs_once(spark):
    """r05 cut-policy: the banded projection behind the candidate self-join
    is persisted and eagerly filled — the signature UDF runs exactly ONCE
    per document, before the join's two scans exist, and repeated
    materializations of the (cached) candidate set never re-sign.  Plan
    strings can't see through caches; the accumulator in the UDF closure
    can (the MINHASH_CALL_COUNTER pattern)."""
    docs = [
        (i, f"document number {i} with some shared words and tail {i % 3}")
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    acc = spark.sparkContext.accumulator(0)
    dedup.MINHASH_CALL_COUNTER = acc
    try:
        pairs = dedup.minhash_lsh_candidates(
            df, "text", "doc_id", num_perm=64, bands=16
        )
        assert acc.value == len(docs), acc.value  # eager fill: one pass
        pairs.collect()
        pairs.collect()
        assert acc.value == len(docs), acc.value  # consumers read the cache
    finally:
        dedup.MINHASH_CALL_COUNTER = None


def test_candidate_caches_release_and_recompute(spark):
    """r05 review: dedup hands PERSISTED candidate pairs to callers (the
    handle is unreachable once a join is built on top), so every hand-off
    is also recorded in the session-wide registry —
    crawler_engine_spark.release_caches() frees them between pipeline
    stages / bench reps, and a consumer that runs afterwards recomputes
    the same result (persist = recomputable lineage, unlike a checkpoint
    cut)."""
    from pyspark.storagelevel import StorageLevel

    from crawler_engine_spark import caches, release_caches

    release_caches()  # drain anything earlier tests registered
    docs = [
        (i, f"document number {i} with some shared words and tail {i % 3}")
        for i in range(20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = dedup.minhash_lsh_candidates(df, "text", "doc_id", num_perm=64, bands=16)
    # identity, not `in`: DataFrame.__eq__ builds a Column
    assert any(h is pairs for h in caches.REGISTRY)
    verified = dedup.verify_jaccard(pairs, df, "text", "doc_id", threshold=0.5)
    before = sorted((r["id_a"], r["id_b"]) for r in verified.collect())

    emb_rows = [(i, [float(i % 4), 1.0, 0.0]) for i in range(12)]
    edf = spark.createDataFrame(emb_rows, "doc_id long, emb array<float>")
    near = dedup.embedding_near_dup_pairs(edf, "emb", "doc_id", dim=3,
                                          threshold=0.99)
    near_before = near.count()
    registered = list(caches.REGISTRY)
    assert len(registered) >= 2  # minhash pairs + embedding pairs

    assert release_caches() == len(registered)
    assert not caches.REGISTRY
    assert all(h.storageLevel == StorageLevel.NONE for h in registered)
    # released ≠ broken: downstream consumers recompute identically
    assert sorted((r["id_a"], r["id_b"]) for r in verified.collect()) == before
    assert near.count() == near_before


def test_failed_operator_call_leaves_drainable_caches(spark):
    """r05: persists register at CREATION, not at hand-off — an operator
    that raises between its persist() and its in-function release leaves
    the cache in the registry (drainable via release_caches) instead of
    stranded with no reachable handle."""
    from pyspark.storagelevel import StorageLevel

    import crawler_engine_spark.operators.dedup as dedup_mod
    from crawler_engine_spark import caches, release_caches

    release_caches()
    df = spark.createDataFrame(
        [(i, f"some shared words tail {i % 3}") for i in range(8)],
        "doc_id long, text string",
    )

    def boom(banded):
        raise RuntimeError("boom")

    orig = dedup_mod._lsh_pair_join
    dedup_mod._lsh_pair_join = boom
    try:
        with pytest.raises(RuntimeError, match="boom"):
            dedup.minhash_lsh_candidates(df, "text", "doc_id")
    finally:
        dedup_mod._lsh_pair_join = orig
    # the banded projection was persisted+filled before the failure; it
    # must be registered (and still cached) rather than lost
    assert len(caches.REGISTRY) == 1
    (h,) = caches.REGISTRY
    assert h.storageLevel != StorageLevel.NONE
    assert release_caches() == 1
    assert h.storageLevel == StorageLevel.NONE


def test_minhash_jaccard_estimate_accuracy(spark):
    """MinHash signature agreement should approximate true Jaccard."""
    a = " ".join(f"w{i}" for i in range(100))
    b = " ".join(f"w{i}" for i in range(50, 150))  # ~1/3 jaccard of shingle sets
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2], "text": [a, b]}))
    sig = df.select(
        "doc_id",
        dedup.minhash_signature_col(
            dedup.shingles_col(dedup.tokens_col(F.col("text")), 3), 128
        ).alias("sig"),
    ).collect()
    s1, s2 = (dict((r["doc_id"], r["sig"]) for r in sig)[i] for i in (1, 2))
    est = sum(x == y for x, y in zip(s1, s2)) / 128
    # true shingle jaccard: windows 0..97 vs 50..147 → overlap 48, union 148
    true = 48 / 148
    assert abs(est - true) < 0.15


def test_simhash_near_duplicates(spark):
    base = " ".join(f"token{i}" for i in range(200))
    near = base.replace("token5 ", "tokenX ")
    other = " ".join(f"different{i}" for i in range(200))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, other]})
    )
    pairs = dedup.simhash_candidates(df, "text", "doc_id").collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["hamming"] <= 3


def test_ngram_jaccard_blocked(spark, docs):
    df = docs.limit(40)
    pairs = dedup.ngram_jaccard_pairs(df, "text", "doc_id", "source", n=2, threshold=0.05)
    for r in pairs.collect():
        assert 0.05 <= r["jaccard"] <= 1.0


def test_embedding_near_dup(spark):
    v = [1.0, 0.0, 0.5, 0.2]
    rows = [
        (1, v),
        (2, [x * 1.001 + 0.001 for x in v]),      # ~identical direction
        (3, [-1.0, 0.2, -0.5, 0.1]),               # far
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = dedup.embedding_near_dup_pairs(df, "embedding", "vec_id", dim=4, threshold=0.99)
    assert [(r["id_a"], r["id_b"]) for r in got.collect()] == [(1, 2)]


def test_embedding_lsh_multitable_recall(spark):
    """The production recall case the exact-path oracle can't see: 150
    synthetic near-dup pairs at cosine ∈ [0.95, 0.98].  One 8-plane band
    collides such a pair with probability (1-θ/π)^8 ≈ 0.4-0.55 — it loses
    roughly half the corpus's true near-dups; the 8-table OR-construction
    must recover ≥ 0.9 (expected ≈ 0.99) with zero false positives after
    the exact verify."""
    rng = np.random.RandomState(1234)
    dim, n_pairs = 32, 150
    rows = []
    for i in range(n_pairs):
        v = rng.randn(dim)
        v /= np.linalg.norm(v)
        c = rng.uniform(0.952, 0.98)  # margin above the 0.95 verify threshold
        u = rng.randn(dim)
        u -= u.dot(v) * v
        u /= np.linalg.norm(u)
        w = c * v + np.sqrt(1 - c * c) * u
        rows.append((i, v.tolist()))
        rows.append((10_000 + i, w.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    truth = {(i, 10_000 + i) for i in range(n_pairs)}

    def recall(n_tables):
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.embedding_near_dup_pairs(
                df, "embedding", "vec_id", dim=dim, threshold=0.95,
                n_tables=n_tables,
            ).collect()
        }
        assert got <= truth  # exact verify ⇒ no false positives
        return len(got & truth) / n_pairs

    single = recall(1)
    multi = recall(8)
    assert single < 0.8, f"single band unexpectedly strong: {single}"
    assert multi >= 0.9, f"multi-table recall too low: {multi}"


# -------------------------------------------------------------- similarity


def test_cosine_topk_brute_matches_numpy(spark, embs):
    sample = embs.limit(200).collect()
    query = sample[0]["embedding"]
    got = similarity.cosine_topk_brute(embs.limit(200), "embedding", "vec_id", query, k=5).collect()
    mat = np.array([r["embedding"] for r in sample])
    ids = np.array([r["vec_id"] for r in sample])
    q = np.array(query)
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-cos, ids))[:5]
    expected = [int(i) for _, i in order]
    assert [r["vec_id"] for r in got] == expected
    assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-9)


def test_cosine_topk_lsh_recall_clustered(spark):
    """On clustered data (where ANN is meaningful) LSH top-k must recover the
    true cluster neighbors; on near-orthogonal data only the exact query hit
    is guaranteed (tested below)."""
    rng = np.random.RandomState(7)
    centers = rng.randn(3, 16) * 4
    rows = []
    for i in range(300):
        c = centers[i % 3]
        rows.append((i, (c + rng.randn(16) * 0.05).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    query = rows[0][1]
    brute = {r["vec_id"] for r in similarity.cosine_topk_brute(df, "embedding", "vec_id", query, 5).collect()}
    ann_rows = similarity.cosine_topk_lsh(df, "embedding", "vec_id", query, 5, multiprobe_bits=1).collect()
    ann = {r["vec_id"] for r in ann_rows}
    assert len(ann & brute) >= 4
    assert ann_rows[0]["cosine"] == pytest.approx(1.0, abs=1e-9)


def test_cosine_topk_lsh_finds_query_on_real_embeddings(spark, embs):
    df = embs.limit(300).cache()
    query = df.first()["embedding"]
    ann_rows = similarity.cosine_topk_lsh(df, "embedding", "vec_id", query, 5, multiprobe_bits=2).collect()
    assert ann_rows[0]["cosine"] == pytest.approx(1.0, abs=1e-9)
    assert ann_rows[0]["vec_id"] == df.first()["vec_id"]


def test_cosine_topk_ivf(spark, embs):
    df = embs.limit(300).cache()
    query = df.first()["embedding"]
    centroids = similarity.build_ivf_centroids(df, "embedding", n_cells=8, sample=128)
    got = similarity.cosine_topk_ivf(df, "embedding", "vec_id", query, centroids, k=5, n_probe=4)
    rows = got.collect()
    assert len(rows) == 5
    assert rows[0]["cosine"] == pytest.approx(1.0, abs=1e-9)


def test_ivf_large_cell_count_uses_udf_and_stays_exact(spark, embs):
    """n_cells=256 goes down the vectorized-UDF assignment path (the
    unrolled expression would explode); probing every cell must still
    reproduce the exact brute-force top-k."""
    df = embs.cache()
    query = df.first()["embedding"]
    centroids = similarity.build_ivf_centroids(df, "embedding", n_cells=256, sample=512)
    assert len(centroids) > similarity.IVF_EXPR_MAX_CELLS
    brute = similarity.cosine_topk_brute(df, "embedding", "vec_id", query, k=10).collect()
    ivf = similarity.cosine_topk_ivf(
        df, "embedding", "vec_id", query, centroids, k=10, n_probe=len(centroids)
    ).collect()
    assert [r["vec_id"] for r in ivf] == [r["vec_id"] for r in brute]
    ivf_pruned = similarity.cosine_topk_ivf(
        df, "embedding", "vec_id", query, centroids, k=5, n_probe=16
    ).collect()
    assert ivf_pruned[0]["cosine"] == pytest.approx(1.0, abs=1e-9)


def test_ivf_udf_assignment_matches_expression(spark, embs):
    """The BLAS-matmul UDF and the unrolled expression are the same argmin —
    per-row cell ids agree on real embeddings."""
    df = embs.limit(300).cache()
    centroids = similarity.build_ivf_centroids(df, "embedding", n_cells=16, sample=256)
    expr = df.select(
        "vec_id", similarity.ivf_assign_col(F.col("embedding"), centroids).alias("cell")
    ).collect()
    udf = df.select(
        "vec_id",
        similarity.make_ivf_assign_udf(centroids)(F.col("embedding")).alias("cell"),
    ).collect()
    assert {r["vec_id"]: r["cell"] for r in expr} == {r["vec_id"]: r["cell"] for r in udf}


# --------------------------------------------------------------- textstats


def test_token_count(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["one two  three", "", "   ", "single"]})
    )
    got = [r["n"] for r in df.select(textstats.token_count_col(F.col("t")).alias("n")).collect()]
    assert got == [3, 0, 0, 1]


def test_lang_id(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "t": [
                    "the cat sat on the mat and the dog is in the house",
                    "der hund ist nicht in der schule und das ist gut",
                    "le chat est dans la maison et les enfants sont dans le jardin",
                    "zzz qqq xxx",
                ]
            }
        )
    )
    got = [r["l"] for r in df.select(textstats.lang_id_col(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_lang_id_wide_coverage(spark):
    """VERDICT r03 #4: lang_id covers the top ~20 languages, not just
    en/de/fr — a Common-Crawl corpus is majority non-en/de/fr and
    corpus_filter / host_reputation gate on this column."""
    samples = {
        "es": "el mercado subió por la tarde pero los precios para sus clientes no",
        "pt": "não sei se você também quer mais disso pelo caminho novo",
        "it": "la qualità di questo prodotto non è per tutti anche se come sempre",
        "nl": "het was een mooie dag maar niet voor iedereen van ons",
        "sv": "det är viktigt att vi har ett bra samarbete för alla och inte bara",
        "da": "jeg ved ikke hvad vi skal og hvor det kan være hvis",
        "fi": "on tärkeää että hän tulee mutta ei vielä kun kaikki ja myös",
        "pl": "to nie jest tylko kwestia czasu oraz tego że jego decyzja bardzo",
        "cs": "to je ale velmi dobré když se na to podívá jako už",
        "ro": "nu este ușor să faci asta pentru că mai sunt multe din care",
        "tr": "bu bir deneme için çok daha iyi olarak ve gibi ama",
        "hu": "ez már nem egy olyan nagy dolog hogy csak volt és mint vagy",
        "id": "ini adalah hal yang sangat penting untuk kita dan tidak dari pada itu",
        "vi": "đây là một trong những điều không thể được của người cũng và",
        "ru": "это не так важно как то что было для его в и",
        "uk": "це дуже важливо але може від того що і та після щоб",
    }
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"lang": list(samples), "t": list(samples.values())})
    )
    got = {
        r["lang"]: r["l"]
        for r in df.select(
            "lang", textstats.lang_id_col(F.col("t")).alias("l")
        ).collect()
    }
    wrong = {k: v for k, v in got.items() if k != v}
    assert not wrong, wrong


_SCRIPT_SAMPLES = {
    # VERDICT r04 #2: non-Latin scripts must classify instead of falling to
    # 'und', plus the latin-dominant and kanji-only edge rules.  r05 widens
    # the table to 24 scripts; one sample per block.
    "zh": "这是一个用于测试的中文句子内容很多而且没有假名",
    "ja": "これは日本語のテスト文章です漢字も含まれています",
    "ko": "이것은 한국어 테스트 문장입니다 감사합니다",
    "ar": "هذه جملة اختبار باللغة العربية وهي طويلة بما يكفي",
    "hi": "यह हिंदी में एक परीक्षण वाक्य है और यह काफी लंबा है",
    "th": "นี่คือประโยคทดสอบภาษาไทยและยาวพอสมควร",
    "el": "αυτή είναι μια δοκιμαστική πρόταση στα ελληνικά",
    "he": "זהו משפט בדיקה בעברית והוא ארוך מספיק",
    "bn": "এটি একটি বাংলা পরীক্ষার বাক্য এবং এটি যথেষ্ট দীর্ঘ",
    "pa": "ਇਹ ਪੰਜਾਬੀ ਵਿੱਚ ਇੱਕ ਟੈਸਟ ਵਾਕ ਹੈ ਅਤੇ ਇਹ ਕਾਫ਼ੀ ਲੰਬਾ ਹੈ",
    "gu": "આ ગુજરાતીમાં એક પરીક્ષણ વાક્ય છે અને તે પૂરતું લાંબું છે",
    "or": "ଏହା ଓଡ଼ିଆରେ ଏକ ପରୀକ୍ଷା ବାକ୍ୟ ଏବଂ ଏହା ଯଥେଷ୍ଟ ଲମ୍ବା",
    "ta": "இது தமிழில் ஒரு சோதனை வாக்கியம் மற்றும் இது போதுமான நீளமானது",
    "te": "ఇది తెలుగులో ఒక పరీక్ష వాక్యం మరియు ఇది తగినంత పొడవుగా ఉంది",
    "kn": "ಇದು ಕನ್ನಡದಲ್ಲಿ ಒಂದು ಪರೀಕ್ಷಾ ವಾಕ್ಯ ಮತ್ತು ಇದು ಸಾಕಷ್ಟು ಉದ್ದವಾಗಿದೆ",
    "ml": "ഇത് മലയാളത്തിലെ ഒരു പരീക്ഷണ വാക്യമാണ് അത് മതിയായ നീളമുണ്ട്",
    "si": "මෙය සිංහල භාෂාවෙන් පරීක්ෂණ වාක්‍යයකි එය ප්‍රමාණවත් දිගය",
    "lo": "ນີ້ແມ່ນປະໂຫຍກທົດສອບພາສາລາວ ແລະມັນຍາວພໍສົມຄວນ",
    "bo": "འདི་ནི་བོད་ཡིག་གི་ཚོད་ལྟའི་ཚིག་གྲུབ་ཡིན",
    "my": "ဤသည်မှာ မြန်မာဘာသာဖြင့် စမ်းသပ်စာကြောင်းဖြစ်သည်",
    "ka": "ეს არის სატესტო წინადადება ქართულ ენაზე და საკმარისად გრძელია",
    "hy": "սա թեստային նախադասություն է հայերենով և բավական երկար է",
    "am": "ይህ በአማርኛ የሙከራ ዓረፍተ ነገር ነው እና በቂ ርዝመት አለው",
    "km": "នេះជាប្រយោគសាកល្បងជាភាសាខ្មែរ ហើយវាវែងគ្រប់គ្រាន់",
}


def test_lang_id_scripts(spark):
    """Script-block stage: every non-Latin script in _SCRIPT_BLOCKS
    classifies; kana attributes Han to 'ja' (kanji-only text stays 'zh');
    a latin-dominant doc with one CJK char stays on the marker path."""
    rows = dict(_SCRIPT_SAMPLES)
    rows["zh_kanji_only"] = "漢字漢字漢字漢字"
    rows["en_with_cjk"] = "the cat sat on the mat 好 and the dog is in the house"
    df = spark.createDataFrame(
        pd.DataFrame({"k": list(rows), "t": list(rows.values())})
    )
    got = {
        r["k"]: r["l"]
        for r in df.select("k", textstats.lang_id_col(F.col("t")).alias("l")).collect()
    }
    want = dict.fromkeys(_SCRIPT_SAMPLES)
    for k in _SCRIPT_SAMPLES:
        want[k] = k
    want["zh_kanji_only"] = "zh"
    want["en_with_cjk"] = "en"
    assert got == want, {k: (got[k], want[k]) for k in want if got[k] != want[k]}


def test_lang_id_scripts_cross_engine(spark):
    """The generated DuckDB oracle agrees with the Spark column on non-Latin
    scripts and on the marker fallthrough (the sf corpus is all-Latin, so
    the driver row alone cannot exercise the script stage)."""
    import duckdb

    import __spark_entry__ as entry_mod

    rows = dict(_SCRIPT_SAMPLES)
    rows["und"] = "zzz qqq 123"
    rows["en"] = "the cat is in the house and that is for the dog"
    rows["ru"] = "это не так важно как то что было для его в и"
    pdf = pd.DataFrame(
        {"doc_id": range(len(rows)), "k": list(rows), "text": list(rows.values())}
    )
    sdf = spark.createDataFrame(pdf[["doc_id", "text"]])
    got_spark = {
        r["doc_id"]: r["l"]
        for r in sdf.select(
            "doc_id", textstats.lang_id_col(F.col("text")).alias("l")
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf[["doc_id", "text"]])
    got_duck = dict(con.execute(entry_mod._lang_id_sql()).fetchall())
    assert got_spark == got_duck
    assert [got_spark[i] for i in range(len(rows))] == list(rows)


def test_quality_score_ranges(spark, docs):
    got = docs.select(textstats.quality_score_col(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in got)


def test_fingerprint_stable_and_md5_compatible(spark):
    import duckdb

    df = spark.createDataFrame(pd.DataFrame({"t": ["hello world", "abc"]}))
    got = {r["t"]: r["fp"] for r in df.select("t", textstats.fingerprint_col(F.col("t")).alias("fp")).collect()}
    for t, fp in got.items():
        expected = int(
            duckdb.sql(f"select md5('{t}')").fetchone()[0][:15], 16
        )
        assert fp == expected


# --------------------------------------------------------------- multimodal


def test_media_feature_plumbing(spark):
    media = multimodal.gen_media_df(spark, 30, partitions=2)
    feats = multimodal.extract_media_features(media, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert r["decode_status"] == "ok"
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert r["payload_bytes"] > 0
    # determinism: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in multimodal.extract_media_features(media, True).collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert again == first


def test_media_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"bytes", "image", fake=False)


def test_media_features_no_shuffle(spark):
    media = multimodal.gen_media_df(spark, 10, partitions=2)
    plan = multimodal.extract_media_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bm25_matches_pure_python(spark, docs):
    """BM25 vs an independent loop implementation on the real corpus."""
    import math
    import re

    from crawler_engine_spark.operators import textstats as ts

    rows = docs.limit(120).collect()
    corpus = {r["doc_id"]: r["text"] for r in rows}
    q_terms = ["spark", "join", "window"]

    def toks(t):
        return [w for w in re.split(r"[^\w']+", t.lower()) if w]

    tok = {i: toks(t) for i, t in corpus.items()}
    n = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n
    dfs = {q: sum(1 for v in tok.values() if q in v) for q in q_terms}
    want = {}
    for i, v in tok.items():
        s = 0.0
        for q in q_terms:
            tf = v.count(q)
            if not tf or not dfs[q]:
                continue
            idf = math.log(1.0 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len(v) / avgdl))
        if s:
            want[i] = round(s, 6)
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: round(r["bm25"], 6)
        for r in ts.bm25_scores(df, "text", "doc_id", " ".join(q_terms)).collect()
    }
    assert got == want


def test_unigram_nll_matches_pure_python(spark, docs):
    """Corpus-unigram NLL vs an independent loop implementation."""
    import math
    import re
    from collections import Counter

    from crawler_engine_spark.operators import textstats as ts

    rows = docs.limit(100).collect()
    corpus = {r["doc_id"]: r["text"] for r in rows}

    def toks(t):
        return [w for w in re.split(r"[^\w']+", t.lower()) if w]

    tok = {i: toks(t) for i, t in corpus.items()}
    counts = Counter(w for v in tok.values() for w in v)
    n = sum(counts.values())
    v = len(counts)
    denom = float(n) + 0.5 * float(v)
    want = {
        i: round(-(sum(math.log((counts[w] + 0.5) / denom) for w in ws) / len(ws)), 6)
        for i, ws in tok.items() if ws
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: round(r["nll"], 6)
        for r in ts.unigram_logprob_scores(df, "text", "doc_id").collect()
    }
    assert got == want
    # sanity: gibberish (rare vocab) scores higher than typical docs
    typical = sum(want.values()) / len(want)
    rare_df = spark.createDataFrame(
        list(corpus.items()) + [(9999, "zzyzx qwfp vvkj xxuu zzyzx qqq")],
        "doc_id long, text string",
    )
    rare = {
        r["doc_id"]: r["nll"]
        for r in ts.unigram_logprob_scores(rare_df, "text", "doc_id").collect()
    }
    assert rare[9999] > typical


def test_asof_join_semantics(spark):
    """Inclusive as-of: events pick the latest update at-or-before their
    ts; no-update events get null."""
    import datetime as dt

    from crawler_engine_spark.operators.windowed import asof_join

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 100, t(5)), (1, 101, t(10)), (1, 102, t(3)), (2, 200, t(7))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(4), 1.5), (1, t(10), 2.5), (3, t(1), 9.9)],
        "user_id long, ts timestamp, rate double",
    )
    got = {
        r["event_id"]: r["rate"]
        for r in asof_join(left, right, "user_id", "ts", ["rate"]).collect()
    }
    assert got == {
        100: 1.5,   # latest <= t5 is t4
        101: 2.5,   # equal timestamp applies (inclusive)
        102: None,  # before any update
        200: None,  # user has no updates
    }


def test_sessionize_semantics(spark):
    import datetime as dt

    from crawler_engine_spark.operators.windowed import sessionize

    t = lambda m: dt.datetime(2026, 1, 1, 0, m, 0)
    df = spark.createDataFrame(
        [(1, 1, t(0)), (1, 2, t(10)), (1, 3, t(45)), (1, 4, t(50)), (2, 5, t(0))],
        "user_id long, event_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, "user_id", "ts", gap_seconds=1800,
                            order_cols=["event_id"]).collect()
    }
    # 30-min gap: events at 0,10 are session 1; 45,50 session 2; user 2 own session 1
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_range_join_semantics(spark):
    """Bin-bucketized range join = exact containment, incl. ranges spanning
    many bins, overlapping ranges, and points matching nothing."""
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 25.0), (3, 999.0), (4, 10.0)], "pid long, x double"
    )
    rng = spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 8.0, 30.0), (12, 100.0, 500.0)],
        "rid long, lo double, hi double",
    )
    from crawler_engine_spark.operators.windowed import range_join

    got = {
        (r["pid"], r["rid"])
        for r in range_join(pts, rng, "x", "lo", "hi", bin_width=7.0).collect()
    }
    assert got == {(1, 10), (2, 11), (4, 10), (4, 11)}


def test_asof_join_null_right_value_and_collision(spark):
    """A matched right row whose value is genuinely null must yield null
    (not an older value); left/value column name collisions fail loudly."""
    import datetime as dt

    from crawler_engine_spark.operators.windowed import asof_join

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 100, t(20))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(5), 5.0), (1, t(10), None)],
        "user_id long, ts timestamp, rate double",
    )
    row = asof_join(left, right, "user_id", "ts", ["rate"]).first()
    assert row["rate"] is None  # latest row matched, its null carried

    clashing = left.withColumnRenamed("event_id", "rate")
    with pytest.raises(ValueError, match="already exist on the left"):
        asof_join(clashing, right, "user_id", "ts", ["rate"])


def test_bm25_query_tokenizer_matches_documents(spark):
    from crawler_engine_spark.operators import textstats as ts

    df = spark.createDataFrame(
        [(1, "don't panic about the café"), (2, "unrelated words entirely here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in ts.bm25_scores(df, "text", "doc_id", "don't café").collect()}
    assert got == {1}

    empty = ts.bm25_scores(df.where(F.lit(False)), "text", "doc_id", "x")
    assert empty.count() == 0 and empty.columns == ["doc_id", "bm25"]


def test_unigram_empty_corpus(spark):
    from crawler_engine_spark.operators import textstats as ts

    df = spark.createDataFrame([], "doc_id long, text string")
    out = ts.unigram_logprob_scores(df, "text", "doc_id")
    assert out.count() == 0 and out.columns == ["doc_id", "nll"]


def test_top_keywords_matches_pure_python(spark):
    """tf·idf keyword ranking vs an independent Counter-based replica,
    including the 6-decimal pre-rank rounding and term-asc tie-break."""
    import math
    from collections import Counter

    from crawler_engine_spark.operators.textstats import (
        _py_tokens,
        top_keywords,
    )

    docs = [
        (1, "spark spark join the the the"),
        (2, "the join window"),
        (3, "window window unique"),
        (4, ""),
    ]
    tf = {i: Counter(_py_tokens(t)) for i, t in docs}
    df = Counter(term for c in tf.values() for term in c)
    n = len(docs)
    want = {}
    for i, c in tf.items():
        if not c:
            continue
        ranked = sorted(
            ((round(cnt * math.log(n / df[t]), 6), t) for t, cnt in c.items()),
            key=lambda x: (-x[0], x[1]),
        )
        want[i] = [t for _, t in ranked[:2]]
    got = {
        r["doc_id"]: r["keywords"]
        for r in top_keywords(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "text", "doc_id", top_k=2,
        ).collect()
    }
    assert got == want
    assert 4 not in got  # token-less doc yields no row
