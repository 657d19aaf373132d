"""crawler_engine_spark — PySpark-native crawl/extract/corpus engine.

:func:`release_caches` drains the session-wide registry of internal
persists that operators hand across call boundaries (LSH candidate
pairs, anchor pre-aggregates, non-eager pagerank state) — see
:mod:`crawler_engine_spark.caches`.  Call it between pipeline stages or
benchmark reps; it is always safe (recomputable lineage).
"""

from .caches import release_all as release_caches

__all__ = ["release_caches"]
