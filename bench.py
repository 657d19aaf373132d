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
# N of the N-vs-4N pair.  2→8 keeps the 4N level inside the machine's flat
# frequency band on this 32-core host; the frequency_control section
# quantifies the ceiling at any pair.
SCALING_N = int(os.environ.get("BENCH_SCALING_N", "2"))
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
    "embedding_topk_ivf",
    "media_features",
    "pricing_summary",
    "revenue_by_segment",
    "extract_structured",
    "extract_adaptive",
    "extract_semantic",
    "extract_rule_based",
    "extract_hybrid",
    "extract_custom",
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


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def run_scaling_worker(_unused: int = 0) -> None:
    """Subprocess entry: the full two-level scaling measurement.

    Protocol (designed against this sandbox's measurement hazards):
    * one shared pages table (32 evenly-sized files; the parquet source
      splits row-groups to each level's parallelism, so task count == cores
      at both levels)
    * N and 4N runs INTERLEAVED, 3 reps each, median per level — single-shot
      timings drift ±20% with CPU frequency state, medians of interleaved
      reps decorrelate that drift
    * a pure-multiprocessing control runs the same kernel with zero Spark at
      both worker counts: its efficiency is the MACHINE's frequency-scaling
      ceiling at 4x parallelism; the engine can't beat physics, so the
      honest engine figure is raw efficiency vs. that ceiling.
    """
    import shutil
    import statistics
    import tempfile

    from crawler_engine_spark.data.gen import gen_pages_df
    from crawler_engine_spark.operators.extraction import extract_pages
    from crawler_engine_spark.session import get_spark

    n = SCALING_N
    tmp = tempfile.mkdtemp(prefix="bench_scale_")
    try:
        path = os.path.join(tmp, "pages")
        s0 = get_spark("bench-scale-gen", master=f"local[{CPUS}]",
                       shuffle_partitions=CPUS)
        gen_pages_df(s0, SCALING_PAGES, partitions=32).write.parquet(path)
        s0.stop()

        def one_run(cpus: int) -> float:
            spark = get_spark(f"bench-scale-{cpus}", master=f"local[{cpus}]",
                              shuffle_partitions=cpus)
            try:
                pages = spark.read.parquet(path)
                _materialize(extract_pages(pages.limit(500), mode="structured"))
                dt = _timed(
                    lambda: _materialize(extract_pages(pages, mode="structured"))
                )
                return SCALING_PAGES / dt
            finally:
                spark.stop()

        res = {n: [], n * 4: []}
        for _rep in range(3):
            for cpus in (n, n * 4):
                res[cpus].append(one_run(cpus))
        lo = statistics.median(res[n])
        hi = statistics.median(res[n * 4])

        out = {
            f"local[{n}]": {"cpus": n, "pages_per_sec": round(lo, 1),
                            "reps": [round(x, 1) for x in res[n]]},
            f"local[{n * 4}]": {"cpus": n * 4, "pages_per_sec": round(hi, 1),
                                "reps": [round(x, 1) for x in res[n * 4]]},
            "efficiency": round((hi / lo) / 4.0, 3),
            "parallelism_ratio": 4.0,
            "frequency_control": _frequency_control(n),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _frequency_control(n: int) -> dict:
    """Machine frequency-scaling ceiling: the same extraction kernel under
    plain multiprocessing (no Spark, no Arrow, no JVM) at N and 4N workers.
    Anything below 1.0 here is CPU turbo/thermal physics, not engine
    overhead."""
    import multiprocessing as mp
    import statistics

    from crawler_engine_spark.kernels import extract as _ex  # noqa: F401

    per_worker = 1200
    res = {n: [], n * 4: []}
    for _rep in range(3):
        for w in (n, n * 4):
            with mp.Pool(w) as pool:
                t0 = time.time()
                pool.map(_control_work, [per_worker] * w)
                res[w].append(w * per_worker / (time.time() - t0))
    lo = statistics.median(res[n])
    hi = statistics.median(res[n * 4])
    return {
        f"mp[{n}]": round(lo, 1),
        f"mp[{n * 4}]": round(hi, 1),
        "ceiling_efficiency": round((hi / lo) / 4.0, 3),
    }


_CONTROL_HTML = (
    '<html lang="en"><head><title>T</title></head><body><article><p>'
    + "word salad spark join merge " * 30
    + '</p></article><ul><li>alpha</li><li>src</li></ul>'
    + '<a href="/d/1">next</a>' * 3
    + "</body></html>"
)


def _control_work(n_pages: int) -> int:
    from crawler_engine_spark.kernels.extract import DEFAULT_OPTIONS, extract_page

    for i in range(n_pages):
        extract_page(f"https://h.example/{i}", _CONTROL_HTML, None, "structured",
                     DEFAULT_OPTIONS)
    return n_pages


def run_scaling() -> dict:
    """N vs 4N cores in a fresh subprocess (clean JVM)."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--scaling-worker", "0"],
        capture_output=True, text=True, timeout=2400,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


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

    # Warm the JVM + one Python-worker stage once so the first timed query
    # isn't charged ~5 s of one-time session startup.
    spark.range(0, 1000).selectExpr("sum(id)").collect()
    _materialize(queries["word_counts"](spark, SF_DIR))

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
