"""Absent-term bloom sidecar — the term-dictionary scale posture.

The reference resolves every query term through a BST in a loaded chunk
(wasm/bst.c), always O(log) local work. Our term dictionary is the
term_stats parquet table; ``warm()`` can pin it on the driver up to ~2M
terms, but a 10^9-term corpus cannot ship its dictionary to the driver and
without it every NOVEL term would cost one Spark term_stats job just to
learn it does not exist.

This sidecar makes absent-term checks driver-local at any dictionary size:

  * terms are hash-partitioned into ranges of ~2^16 terms; each range gets
    one bloom filter row (12 bits/term, k=7 → ~0.4% false-positive rate);
  * the sidecar is O(n_terms · 12 bits) TOTAL but loaded per row — a driver
    holds all rows for dictionaries up to ``max_eager_rows`` ranges eagerly
    and, beyond that, fetches rows per range on demand into a bounded LRU
    (rows are independent; a probe needs exactly ONE row). The per-range
    fetch is a driver-local pyarrow read with a range_id predicate — the
    sidecar is written range_id-sorted so parquet row-group stats prune it
    — and costs zero Spark jobs either way;
  * probe says "definitely absent" (skip the lookup job entirely — the
    overwhelmingly common case for typo/OOV terms) or "maybe present"
    (fall through to the normal term_stats pushdown scan). No false
    negatives by construction, so results are bit-identical.

Build side is one groupBy(range_id) over the term_stats table —
applyInPandas computes each range's bit array; probe side is two md5-derived
hashes + k = 7 double-hashed positions (Kirsch–Mitzenmacher composition is
fine for Bloom membership, unlike for MinHash sketches).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession

BITS_PER_TERM = 12
BLOOM_K = 7
RANGE_TERMS = 1 << 16  # terms per bloom row
M_BITS = BITS_PER_TERM * RANGE_TERMS  # fixed row size: 96 KiB of bits


def term_range_id(term: str, n_ranges: int) -> int:
    """Range routing hash — bytes 12..16 of md5 (disjoint from the probe
    hashes' bytes 0..8)."""
    d = hashlib.md5(term.encode("utf-8")).digest()
    return int.from_bytes(d[12:16], "big") % n_ranges


def _positions(term: str) -> np.ndarray:
    d = hashlib.md5(term.encode("utf-8")).digest()
    h1 = int.from_bytes(d[0:4], "big")
    h2 = int.from_bytes(d[4:8], "big") | 1
    return (h1 + np.arange(BLOOM_K, dtype=np.uint64) * np.uint64(h2)) % np.uint64(M_BITS)


def _set_bits(bits: np.ndarray, terms) -> None:
    for t in terms:
        pos = _positions(t)
        bits[pos >> np.uint64(3)] |= (1 << (pos & np.uint64(7))).astype(np.uint8)


def build_term_bloom(spark: SparkSession, term_stats: DataFrame, out_path: str,
                     n_terms: int) -> int:
    """Write the sidecar: one row per range (range_id, n_ranges, bits).
    Distributed: range assignment is a JVM md5 expression, bit arrays are
    built per range in applyInPandas (each group ≈ 2^16 terms)."""
    import pandas as pd
    from pyspark.sql import functions as F

    n_ranges = max(1, -(-n_terms // RANGE_TERMS))
    karr = np.arange(BLOOM_K, dtype=np.uint64)[None, :]

    def make_bloom(pdf: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized: h1/h2 arrive as JVM-computed md5 windows, so no
        # per-term Python hashing (the stage was hash-bound before)
        h1 = pdf["h1"].to_numpy().astype(np.uint64)
        h2 = pdf["h2"].to_numpy().astype(np.uint64) | np.uint64(1)
        pos = (h1[:, None] + karr * h2[:, None]) % np.uint64(M_BITS)
        bits = np.zeros(M_BITS // 8, dtype=np.uint8)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).ravel(),
                         (1 << (pos & np.uint64(7))).astype(np.uint8).ravel())
        return pd.DataFrame({
            "range_id": [int(pdf["rid"].iloc[0])],
            "n_ranges": [n_ranges],
            "bits": [bits.tobytes()],
        })

    # JVM md5 windows must equal the driver probe's (_positions /
    # term_range_id): hex chars 1-8 = digest bytes 0:4 (h1), chars 9-16 =
    # bytes 4:8 (h2), chars 25-32 = bytes 12:16 (range id).
    # term_stats is unique per term within one build (groupBy output), so no
    # distinct — duplicate inserts would be idempotent for a bloom anyway.
    md5 = F.md5(F.col("term"))
    (
        term_stats.select(
            (F.conv(F.substring(md5, 25, 8), 16, 10).cast("long") % n_ranges).alias("rid"),
            F.conv(F.substring(md5, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(md5, 9, 8), 16, 10).cast("long").alias("h2"),
        )
        .groupBy("rid")
        .applyInPandas(make_bloom, "range_id long, n_ranges long, bits binary")
        # range_id-sorted files ⇒ parquet row-group min/max stats make the
        # lazy per-range fetch a pruned point read, not a sidecar scan
        .repartitionByRange(max(1, n_ranges // 512), "range_id")
        .sortWithinPartitions("range_id")
        .write.mode("overwrite").parquet(out_path)
    )
    return n_ranges


class TermBloom:
    """Driver-side probe over one index's sidecar rows.

    Eager mode (``loader=None``): all rows live in ``_bits``; a range with
    no row holds no terms at all ⇒ definitely absent.

    Lazy mode: ``loader(range_id) -> bytes | None`` fetches a row on first
    probe of its range; ``max_cached_rows`` bounds the LRU (96 KiB/row), so
    a 10^9-term dictionary (~15k ranges, 1.4 GB) costs the driver only the
    hot ranges. ``rows_fetched`` counts loader calls (test-asserted: ≤1 per
    novel range, 0 on re-probe of a cached range)."""

    def __init__(self, rows, loader=None, n_ranges: int | None = None,
                 max_cached_rows: int | None = None):
        from collections import OrderedDict

        rows = list(rows)
        self.n_ranges = int(n_ranges if n_ranges is not None
                            else (rows[0]["n_ranges"] if rows else 1))
        self._bits: "OrderedDict[int, np.ndarray | None]" = OrderedDict(
            (int(r["range_id"]), np.frombuffer(bytes(r["bits"]), dtype=np.uint8))
            for r in rows
        )
        self._loader = loader
        self._max = max_cached_rows
        self.rows_fetched = 0

    def _range_bits(self, rid: int) -> np.ndarray | None:
        if rid in self._bits:
            self._bits.move_to_end(rid)
            return self._bits[rid]
        if self._loader is None:
            return None  # eager mode: no row ⇒ empty range
        raw = self._loader(rid)
        self.rows_fetched += 1
        bits = None if raw is None else np.frombuffer(raw, dtype=np.uint8)
        self._bits[rid] = bits  # negative result cached too
        if self._max is not None:
            while len(self._bits) > self._max:
                self._bits.popitem(last=False)
        return bits

    def definitely_absent(self, term: str) -> bool:
        bits = self._range_bits(term_range_id(term, self.n_ranges))
        if bits is None:
            return True  # no terms hashed to this range at all
        pos = _positions(term)
        return not bool(np.all(bits[pos >> np.uint64(3)] & (1 << (pos & np.uint64(7))).astype(np.uint8)))


def _open_sidecar(path: str):
    """pyarrow dataset over a local OR remote (hdfs://, s3a://, ...) sidecar
    dir; None when absent/empty or pyarrow has no driver for the scheme."""
    import glob as _glob

    import pyarrow.dataset as ds

    if "://" not in path or path.startswith("file://"):
        local = path[len("file://"):] if path.startswith("file://") else path
        if not os.path.exists(local):
            return None
        files = sorted(_glob.glob(os.path.join(local, "*.parquet")))
        return ds.dataset(files, format="parquet") if files else None
    try:
        from pyarrow import fs as pafs

        # pyarrow speaks s3://, not Hadoop's s3a:// alias
        uri = "s3://" + path[len("s3a://"):] if path.startswith("s3a://") else path
        filesystem, rel = pafs.FileSystem.from_uri(uri)
        infos = filesystem.get_file_info(pafs.FileSelector(rel, recursive=False))
        files = sorted(i.path for i in infos
                       if i.type == pafs.FileType.File and i.path.endswith(".parquet"))
        if not files:
            return None
        return ds.dataset(files, format="parquet", filesystem=filesystem)
    except Exception:
        return None


def _load_via_spark(spark, path: str, max_eager_rows: int,
                    max_cached_rows: int) -> TermBloom | None:
    """Sidecar via Spark's Hadoop filesystem — the fallback for remote dirs
    pyarrow can't open. Costs Spark jobs (schema infer + collect), so the
    local/pyarrow path stays the fast default."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    try:
        sdf = spark.read.parquet(path)
        n_rows = sdf.count()
    except AnalysisException:
        return None
    except Exception:
        # the bloom is an optional accelerator: any reachability failure
        # (permissions, transient fs) degrades to the term_stats fallback
        # instead of failing the query
        return None
    if n_rows == 0:
        return None
    if n_rows <= max_eager_rows:
        return TermBloom([r.asDict() for r in sdf.collect()])
    n_ranges = sdf.select("n_ranges").head()["n_ranges"]

    def loader(rid: int):
        rows = sdf.filter(F.col("range_id") == rid).select("bits").collect()
        return bytes(rows[0]["bits"]) if rows else None

    return TermBloom([], loader=loader, n_ranges=int(n_ranges),
                     max_cached_rows=max_cached_rows)


def load_term_bloom(spark: SparkSession, index_dir: str,
                    max_eager_rows: int = 4096,
                    max_cached_rows: int = 1024) -> TermBloom | None:
    """Open the sidecar with ZERO Spark jobs (driver-local pyarrow read —
    the probe is a control-plane structure, same posture as the reference
    worker reading its own chunk metadata). ≤ ``max_eager_rows`` ranges
    (~384 MB of bits) load whole; bigger dictionaries get the per-range
    lazy LRU. None when the sidecar is absent (pre-bloom index) — callers
    fall back to the term_stats scan."""
    import pyarrow.dataset as ds

    path = os.path.join(index_dir, "term_bloom") if "://" not in index_dir \
        else index_dir.rstrip("/") + "/term_bloom"
    dset = _open_sidecar(path)
    if dset is None:
        if "://" not in path or path.startswith("file://"):
            # LOCAL and absent = pre-bloom index, definitively: no point
            # paying a Spark analysis round-trip that cannot succeed
            return None
        # non-local dir pyarrow can't reach (e.g. hdfs:// without libhdfs):
        # keep the sidecar alive through Spark's own filesystem rather than
        # silently dropping it and paying a term_stats scan per OOV term
        return _load_via_spark(spark, path, max_eager_rows, max_cached_rows)
    n_rows = dset.count_rows()
    if n_rows <= max_eager_rows:
        tbl = dset.to_table()
        rows = [{"range_id": rid, "n_ranges": nr, "bits": bits}
                for rid, nr, bits in zip(tbl["range_id"].to_pylist(),
                                         tbl["n_ranges"].to_pylist(),
                                         tbl["bits"].to_pylist())]
        return TermBloom(rows)
    n_ranges = dset.head(1)["n_ranges"][0].as_py()

    def loader(rid: int):
        t = dset.to_table(filter=ds.field("range_id") == rid, columns=["bits"])
        return t["bits"][0].as_py() if t.num_rows else None

    return TermBloom([], loader=loader, n_ranges=int(n_ranges),
                     max_cached_rows=max_cached_rows)
