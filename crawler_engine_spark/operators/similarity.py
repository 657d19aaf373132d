"""Similarity search over embedding columns.

* brute-force cosine top-k — the exact baseline: one pass, JVM-side
  aggregate expressions, TakeOrderedAndProject for the limit (no full sort).
* LSH-bucketed ANN — the scale path: probe only rows sharing (or adjacent
  to) the query's hyperplane sign bucket; recall controlled by multi-probe.
* IVF-style variant — coarse k-means-free centroids derived deterministically
  from hashed sample points; probe nearest cells only.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from .dedup import _hyperplanes, cosine_col, embedding_bucket_col


def _query_lit(query: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query])


def cosine_topk_brute(
    df: DataFrame, emb_col: str, id_col: str, query: Sequence[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine: scan + TakeOrderedAndProject (no shuffle sort)."""
    return (
        df.select(
            F.col(id_col),
            cosine_col(F.col(emb_col), _query_lit(query)).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_topk_lsh(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 8,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict the scan to hyperplane buckets within
    ``multiprobe_bits`` Hamming distance of the query's bucket, then exact
    cosine rank inside.  At 100 TB the bucket column is precomputed and the
    pages table is partitioned by it → partition pruning does the skip."""
    dim = dim or len(query)
    planes = np.array(_hyperplanes(dim, n_planes))
    q = np.asarray(list(query), dtype=float)
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, q)) > 0))
    probe = {qbucket}
    if multiprobe_bits >= 1:
        probe.update(qbucket ^ (1 << i) for i in range(n_planes))
    if multiprobe_bits >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probe.add(qbucket ^ (1 << i) ^ (1 << j))
    bucketed = df.withColumn(
        "_bucket", embedding_bucket_col(F.col(emb_col), dim, n_planes)
    ).where(F.col("_bucket").isin(list(probe)))
    return cosine_topk_brute(bucketed, emb_col, id_col, query, k)


def build_ivf_centroids(
    df: DataFrame, emb_col: str, n_cells: int = 16, sample: int = 2048, seed: int = 42
) -> List[List[float]]:
    """Deterministic coarse centroids: sample rows (seeded), run a few
    Lloyd iterations driver-side (centroid set is tiny; the heavy assignment
    stays distributed)."""
    rows = (
        df.select(emb_col)
        .orderBy(F.xxhash64(F.col(emb_col).cast("string"), F.lit(seed)))
        .limit(sample)
        .collect()
    )
    pts = np.array([r[0] for r in rows], dtype=float)
    if len(pts) == 0:
        return []
    n_cells = min(n_cells, len(pts))
    centroids = pts[:n_cells].copy()
    for _ in range(5):
        d = ((pts[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_cells):
            mask = assign == c
            if mask.any():
                centroids[c] = pts[mask].mean(0)
    return centroids.tolist()


# Above this many cells the unrolled when-chain expression explodes (both
# plan size and codegen), so assignment switches to the vectorized UDF.
IVF_EXPR_MAX_CELLS = 32


def ivf_assign_col(emb_col, centroids: List[List[float]]):
    """Nearest-centroid cell id as a column expression (argmin over squared
    distances, unrolled).  Correct for small centroid counts only — for
    n_cells > IVF_EXPR_MAX_CELLS use make_ivf_assign_udf (this chain grows
    one nested when() per centroid and stalls Catalyst/codegen at hundreds
    of cells)."""
    best_id = F.lit(0)
    best_d = None
    for cid, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(emb_col, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if best_d is None:
            best_d = d
        else:
            best_id = F.when(d < best_d, F.lit(cid)).otherwise(best_id)
            best_d = F.least(best_d, d)
    return best_id


def make_ivf_assign_udf(centroids: List[List[float]]):
    """Arrow-batched nearest-centroid assignment: one BLAS matmul per batch
    via argmin(-2·X·Cᵀ + ‖c‖²) — equivalent to squared-distance argmin
    because ‖x‖² is constant per row — so memory is O(batch × cells), never
    O(batch × cells × dim).  This is the production path for large
    n_cells; ties resolve to the lowest cell id, same as the expression."""
    cents = np.asarray(centroids, dtype=np.float64)
    c_norm2 = (cents**2).sum(axis=1)

    dim = cents.shape[1]

    @pandas_udf(T.IntegerType())
    def assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            if len(batch) == 0:
                yield pd.Series([], dtype="int32")
                continue
            # null / wrong-length embeddings assign to cell 0, matching the
            # unrolled expression's fallback (its when-chain keeps the
            # initial best_id when every distance is null)
            rows = []
            for v in batch:
                if v is not None and len(v) == dim:
                    rows.append(np.asarray(v, dtype=np.float64))
                else:
                    rows.append(None)
            ok = np.array([r is not None for r in rows])
            out = np.zeros(len(rows), dtype=np.int32)
            if ok.any():
                mat = np.stack([r for r in rows if r is not None])
                scores = -2.0 * (mat @ cents.T) + c_norm2[None, :]
                out[ok] = scores.argmin(axis=1).astype(np.int32)
            yield pd.Series(out)

    return assign


def ivf_assign(emb_col, centroids: List[List[float]]):
    """Dispatch: unrolled expression for small centroid sets (stays in
    whole-stage codegen), vectorized pandas UDF beyond IVF_EXPR_MAX_CELLS.

    The two paths compute the same argmin through different float formulas
    (Σ(x−c)² vs −2x·c+‖c‖²), so exact near-ties can assign differently at
    the boundary — harmless for ANN cell routing (tested equal on real
    embeddings), but don't rely on bit-identical cell ids across the
    dispatch threshold."""
    if len(centroids) <= IVF_EXPR_MAX_CELLS:
        return ivf_assign_col(emb_col, centroids)
    return make_ivf_assign_udf(centroids)(emb_col)


def cosine_topk_ivf(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    query: Sequence[float],
    centroids: List[List[float]],
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """IVF search: rank centroids by distance to the query driver-side,
    scan only the n_probe nearest cells."""
    q = np.asarray(list(query), dtype=float)
    cents = np.array(centroids, dtype=float)
    order = np.argsort(((cents - q) ** 2).sum(1))[:n_probe].tolist()
    scoped = df.withColumn("_cell", ivf_assign(F.col(emb_col), centroids)).where(
        F.col("_cell").isin([int(c) for c in order])
    )
    return cosine_topk_brute(scoped, emb_col, id_col, query, k)
