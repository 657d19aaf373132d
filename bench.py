"""Benchmark harness: headline queries + crawl throughput + scaling evidence.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "crawl": {...}, "scaling": {...}}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

The scaling section runs the same fixed extraction workload at local[N] and
local[4N] in fresh subprocesses (the sandbox stand-in for N vs 4N executors
per BASELINE.md) and reports throughput at both plus the efficiency
(thr_4N / thr_N) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Sized so per-level compute (~2.7 ms/page kernel time) dominates the fixed
# Spark job overhead — smaller workloads under-report scaling efficiency.
SCALING_PAGES = int(os.environ.get("BENCH_SCALING_PAGES", "100000"))
CRAWL_PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "20000"))

BENCH_QUERIES = [
    "url_canonicalize",
    "politeness_select",
    "word_counts",
    "lang_id",
    "quality_score",
    "exact_dedup",
    "minhash_near_dup",
    "simhash",
    "embedding_topk",
    "pricing_summary",
    "revenue_by_segment",
    "extract_structured",
    "extract_adaptive",
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_scaling_worker(cpus: int) -> None:
    """Subprocess entry: time a fixed extraction workload at local[cpus].

    Pages are materialized to parquet first so the timed job is a single
    scan → mapInPandas kernel → noop sink (one Python stage per task;
    chaining the generator would double the Python workers and contend)."""
    import shutil
    import tempfile

    from crawler_engine_spark.data.gen import gen_pages_df
    from crawler_engine_spark.operators.extraction import extract_pages
    from crawler_engine_spark.session import get_spark

    spark = get_spark(f"bench-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    tmp = tempfile.mkdtemp(prefix=f"bench_scale_{cpus}_")
    try:
        path = os.path.join(tmp, "pages")
        gen_pages_df(spark, SCALING_PAGES, partitions=max(cpus * 2, 8)).write.parquet(path)
        pages = spark.read.parquet(path)
        _materialize(extract_pages(pages.limit(500), mode="structured"))  # warm
        t0 = time.time()
        _materialize(extract_pages(pages, mode="structured"))
        dt = time.time() - t0
        print(json.dumps({"cpus": cpus, "seconds": dt,
                          "pages_per_sec": SCALING_PAGES / dt}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def run_scaling() -> dict:
    """N vs 4N cores (BASELINE.md). N = CPUS/8 so the 4N level still has
    machine headroom for the JVM scan + Arrow threads that accompany the
    Python kernel workers — at full machine width those threads contend with
    the workers and the measurement reflects oversubscription, not the
    engine's scaling."""
    out = {}
    n = max(CPUS // 8, 2)
    for cpus in (n, n * 4):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker", str(cpus)],
            capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        out[f"local[{cpus}]"] = json.loads(line)
    lo, hi = out[f"local[{n}]"], out[f"local[{n * 4}]"]
    out["efficiency"] = round(
        (hi["pages_per_sec"] / lo["pages_per_sec"]) / 4.0, 3
    )
    out["parallelism_ratio"] = 4.0
    return out


def run_crawl(spark) -> dict:
    import shutil
    import tempfile

    import pandas as pd

    from crawler_engine_spark.data import gen
    from crawler_engine_spark.frontier.rounds import CrawlConfig, CrawlEngine

    tmp = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        pages_path = os.path.join(tmp, "pages")
        gen.gen_pages_df(spark, CRAWL_PAGES, partitions=CPUS).write.parquet(pages_path)
        robots = spark.createDataFrame(
            pd.DataFrame(gen.gen_robots()),
            "host string, disallow_prefixes array<string>, crawl_delay_s double",
        )
        eng = CrawlEngine(
            spark, os.path.join(tmp, "state"), pages_path, robots,
            CrawlConfig(round_seconds=120.0),
        )
        seeds = spark.createDataFrame(
            pd.DataFrame(gen.gen_seeds(CRAWL_PAGES, 20)),
            "url string, seed_rank int, query string",
        )
        eng.init_from_seeds(seeds)
        t0 = time.time()
        records = eng.run(max_rounds=3)
        dt = time.time() - t0
        fetched = sum(r["fetched"] for r in records)
        return {
            "rounds": len(records),
            "urls_fetched": fetched,
            "seconds": round(dt, 2),
            "urls_per_sec": round(fetched / dt, 2),
            "round_wall_sec": round(dt / max(len(records), 1), 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    import __spark_entry__ as entry_mod
    from crawler_engine_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    queries = entry_mod.queries()

    timings = {}
    t_suite = time.time()
    for name in BENCH_QUERIES:
        t0 = time.time()
        _materialize(queries[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
    suite_seconds = round(time.time() - t_suite, 3)

    crawl = run_crawl(spark)
    spark.stop()

    scaling = run_scaling()

    print(
        json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": suite_seconds,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(SF_DIR),
                "crawl": crawl,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--scaling-worker":
        run_scaling_worker(int(sys.argv[2]))
    else:
        main()
