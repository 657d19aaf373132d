"""Interleaved A/B re-measurement of the BENCH_r02 regressions (VERDICT #7).

The five queries regressed r01→r02 with no code change (git-verified); this
measures each 7× in ONE session with reps interleaved across queries so CPU
frequency drift decorrelates, and reports median/min/max per query.  If the
medians land at or below the r01 figures, the r02 deltas were suite-position
/ warmup noise, not plan changes.  Not part of bench.py — a one-shot
diagnostic whose result is recorded in BENCH.md.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# default: the r02 regression set; pass a comma list as argv[1] to A/B any
# catalog queries (r05 uses this for the cut-policy flatness check)
QUERIES = (
    sys.argv[1].split(",")
    if len(sys.argv) > 1
    else [
        "pricing_summary", "revenue_by_segment", "embedding_topk",
        "embedding_topk_ivf", "exact_dedup",
    ]
)
R01 = {"pricing_summary": 0.47, "revenue_by_segment": 1.03,
       "embedding_topk": 0.49, "embedding_topk_ivf": 1.99, "exact_dedup": 0.59}
R02 = {"pricing_summary": 1.33, "revenue_by_segment": 1.73,
       "embedding_topk": 0.67, "embedding_topk_ivf": 2.86, "exact_dedup": 0.83}


def main():
    import __spark_entry__ as entry_mod
    from crawler_engine_spark.session import get_spark

    spark = get_spark("bench-ab", master="local[32]", shuffle_partitions=32)
    queries = entry_mod.queries()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # identical warmup to bench.py
    spark.range(0, 1000).selectExpr("sum(id)").collect()
    mat(queries["word_counts"](spark, SF_DIR))
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    mat(spark.range(0, 320).repartition(32).select(_warm(col("id"))))
    from crawler_engine_spark import release_caches

    for name in QUERIES:  # one untimed warm pass per query
        mat(queries[name](spark, SF_DIR))
        release_caches()

    reps = {n: [] for n in QUERIES}
    for _ in range(7):
        for name in QUERIES:
            t0 = time.time()
            mat(queries[name](spark, SF_DIR))
            reps[name].append(round(time.time() - t0, 3))
            # 8 calls per cache-handing query would otherwise strand 8
            # candidate-set persists in executor storage for the session
            release_caches()
    out = {}
    for n in QUERIES:
        out[n] = {
            "median": round(statistics.median(reps[n]), 3),
            "min": min(reps[n]), "max": max(reps[n]), "reps": reps[n],
            "r01": R01.get(n), "r02": R02.get(n),
        }
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
