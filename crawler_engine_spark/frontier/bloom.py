"""Partitioned Bloom-filter URL-seen set.

Design (north rule: "bloom/cuckoo URL-seen set keyed by
xxhash64(canonical_url)" at 10^10-URL scale):

* The frontier key space is hash-partitioned: ``pid = pmod(xxhash64(url), P)``
  (computed JVM-side).  Each partition owns one Bloom segment.
* Segments are built/updated by an ``applyInPandas`` pass — each task reads
  only ITS segment file, ORs in the new keys, writes the next round's file.
  No segment ever moves through the driver; storage is a shared directory
  (local FS in the sandbox, HDFS/S3 on a cluster).
* Probe: candidates grouped by pid; each task loads one segment and emits a
  ``maybe_seen`` flag.  Bloom guarantees no false negatives, so
  ``maybe_seen = false`` rows are **definitely new** and skip the exact
  anti-join entirely; only the (small) ``maybe_seen = true`` subset joins the
  exact seen-set table to eliminate false positives.  That asymmetry is the
  whole point at 10^10: the expensive exact join sees a tiny fraction of the
  candidate stream.

Sizing math (documented design point): 10^10 keys / 4096 partitions ≈ 2.4M
keys/segment; at 10 bits/key ≈ 3 MB/segment, 12 GB total, fpr ≈ 0.8%.
Sandbox default: 32 partitions × 2^20 bits (128 KiB) each.

Bit positions use the Kirsch-Mitzenmacher double-hashing scheme over two
64-bit halves of ``blake2b(canonical_url)`` — computed in Python on both the
build and probe side, so no cross-language hash agreement is needed (the
xxhash64 column only routes rows to partitions).
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_PARTITIONS = 32
DEFAULT_BITS_PER_SEGMENT = 1 << 20  # 128 KiB / segment in the sandbox
DEFAULT_NUM_HASHES = 7


def partition_id_col(url_hash_col, num_partitions: int):
    return F.pmod(url_hash_col, F.lit(num_partitions)).cast("int")


def _bit_positions(url: str, m: int, k: int) -> np.ndarray:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return np.fromiter(((h1 + i * h2) % m for i in range(k)), dtype=np.int64, count=k)


def _segment_path(root: str, pid: int) -> str:
    return os.path.join(root, f"segment_{pid:05d}.bin")


def _load_segment(root: str | None, pid: int, m: int) -> np.ndarray:
    if root is not None:
        path = _segment_path(root, pid)
        if os.path.exists(path):
            return np.unpackbits(np.fromfile(path, dtype=np.uint8))[:m].astype(bool)
    return np.zeros(m, dtype=bool)


def _store_segment(root: str, pid: int, bits: np.ndarray) -> None:
    os.makedirs(root, exist_ok=True)
    tmp = _segment_path(root, pid) + ".tmp"
    np.packbits(bits.astype(np.uint8)).tofile(tmp)
    os.replace(tmp, _segment_path(root, pid))


class BloomSeenSet:
    """Manages the partitioned bloom segments for one crawl state directory."""

    def __init__(
        self,
        num_partitions: int = DEFAULT_NUM_PARTITIONS,
        bits_per_segment: int = DEFAULT_BITS_PER_SEGMENT,
        num_hashes: int = DEFAULT_NUM_HASHES,
    ) -> None:
        self.num_partitions = num_partitions
        self.bits = bits_per_segment
        self.k = num_hashes

    # ------------------------------------------------------------- build
    def update(
        self,
        new_urls: DataFrame,
        prev_dir: str | None,
        out_dir: str,
        url_col: str = "canonical_url",
        hash_col: str = "url_hash",
    ) -> int:
        """OR the new keys into each partition's segment; write ``out_dir``.

        Executor-side: each group task touches one segment file only.
        Returns the number of partitions written (empty partitions copy the
        previous segment forward so every round directory is self-contained).
        """
        m, k, P = self.bits, self.k, self.num_partitions

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf["_pid"].iloc[0])
            bits = _load_segment(prev_dir, pid, m)
            for url in pdf[url_col]:
                bits[_bit_positions(url, m, k)] = True
            _store_segment(out_dir, pid, bits)
            return pd.DataFrame({"pid": [pid], "inserted": [len(pdf)]})

        routed = new_urls.withColumn("_pid", partition_id_col(F.col(hash_col), P))
        written = routed.groupBy("_pid").applyInPandas(build, "pid int, inserted long")
        touched = {r["pid"] for r in written.collect()}
        # Carry untouched segments forward so out_dir is complete.
        for pid in range(P):
            if pid not in touched:
                _store_segment(out_dir, pid, _load_segment(prev_dir, pid, m))
        return len(touched)

    # ------------------------------------------------------------- probe
    def flag_maybe_seen(
        self,
        candidates: DataFrame,
        segments_dir: str,
        url_col: str = "canonical_url",
        hash_col: str = "url_hash",
    ) -> DataFrame:
        """Append a ``maybe_seen`` boolean column (no false negatives)."""
        m, k, P = self.bits, self.k, self.num_partitions
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
        ) + ", maybe_seen boolean"

        def probe(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf["_pid"].iloc[0])
            bits = _load_segment(segments_dir, pid, m)
            flags: List[bool] = []
            for url in pdf[url_col]:
                pos = _bit_positions(url, m, k)
                flags.append(bool(bits[pos].all()))
            out = pdf.drop(columns=["_pid"]).copy()
            out["maybe_seen"] = flags
            return out

        routed = candidates.withColumn("_pid", partition_id_col(F.col(hash_col), P))
        return routed.groupBy("_pid").applyInPandas(probe, out_schema)
