"""Incremental index maintenance via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.3: no streaming anywhere);
this is the additive capability a live corpus needs: documents arrive as a
stream, each micro-batch becomes an immutable index *segment* (the
Lucene/LSM pattern), and queries run over the union of segments.

Mechanics:
  * ``foreachBatch`` drives ``ingest_batch``: docIDs continue densely from
    the previous segment (offset recorded in the root manifest, so a
    restarted stream resumes the id space), and the segment is built by the
    ordinary batch builder — same format, same manifest, same resumability.
  * Segments' docID ranges are disjoint, so their (term, salt) posting
    shards never interleave → a multi-segment query is the same
    concatenation merge the salted build already does.
  * ``MultiSegmentEngine`` unions the segment tables and recomputes global
    stats (N, avgdl) so exhaustive BM25 scores are *exactly* what a
    single-shot build of the full corpus yields (asserted in tests). The
    per-block WAND maxima were baked with per-segment avgdl, so the pruned
    kernel is only used after ``compact()`` (segment rewrite refreshing the
    metadata) — Lucene merges have the same role.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..build import IndexConfig, build_index
from ..engine import SearchEngine


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, root: str, config: IndexConfig | None = None,
                 order_cols=("repo", "path", "commit"), content_col: str = "content"):
        self.spark = spark
        self.root = root
        self.cfg = config or IndexConfig()
        self.order_cols = tuple(order_cols)
        self.content_col = content_col
        os.makedirs(root, exist_ok=True)

    # ---- root manifest: segment list + next docID ----
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "segments.json")

    def manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"segments": [], "next_doc_id": 0}

    def _commit(self, man: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=2)
        os.replace(tmp, self._manifest_path)

    def segment_dirs(self) -> list[str]:
        return [os.path.join(self.root, s) for s in self.manifest()["segments"]]

    # ---- ingest ----
    def ingest_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """One micro-batch → one segment. Idempotent per epoch (foreachBatch
        may retry a failed epoch; the segment name is the epoch id and a
        completed segment is skipped)."""
        man = self.manifest()
        seg_name = f"seg_{epoch_id:06d}"
        if seg_name in man["segments"]:
            return
        n_rows = batch.count()
        if n_rows == 0:
            return
        seg_dir = os.path.join(self.root, seg_name)
        base = man["next_doc_id"]
        from ..docids import assign_doc_ids

        with_ids = assign_doc_ids(batch, self.order_cols, doc_id_col="doc_id")
        with_ids = with_ids.withColumn("doc_id", F.col("doc_id") + F.lit(base))
        build_index(
            self.spark, with_ids, seg_dir, self.cfg,
            doc_id_col="doc_id", content_col=self.content_col, resume=True,
        )
        cache = getattr(with_ids, "_docid_cache", None)
        if cache is not None:
            cache.unpersist()
        man["segments"].append(seg_name)
        man["next_doc_id"] = base + n_rows
        self._commit(man)

    def start_stream(self, stream_df: DataFrame, checkpoint: str | None = None):
        """Attach to a streaming DataFrame; one segment per micro-batch."""
        return (
            stream_df.writeStream.foreachBatch(self.ingest_batch)
            .option("checkpointLocation", checkpoint or os.path.join(self.root, "_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )

    def engine(self) -> "MultiSegmentEngine":
        return MultiSegmentEngine(self.spark, self.segment_dirs())

    def compact(self, out_dir: str) -> str:
        """Merge all segments into one fresh index (rebuilds block-max
        metadata under the global avgdl, re-enabling the WAND kernel)."""
        segs = self.segment_dirs()
        docs = self.spark.read.parquet(*[f"{s}/docs" for s in segs])
        build_index(
            self.spark, docs.drop("sha256"), out_dir, self.cfg,
            doc_id_col="doc_id", content_col=self.content_col, resume=True,
        )
        return out_dir


class MultiSegmentEngine(SearchEngine):
    """SearchEngine over the union of segment tables with recomputed global
    stats — exhaustive BM25 is exact (identical to a single-shot build)."""

    def __init__(self, spark: SparkSession, segment_dirs: list[str]):
        if not segment_dirs:
            raise ValueError("no segments")
        self.spark = spark
        self.index_dir = segment_dirs[0]  # for doclens property base; overridden below
        self._segment_dirs = segment_dirs
        stats = None
        n_docs = 0
        total_tokens = 0
        self._segment_avgdls: list[float] = []
        for s in segment_dirs:
            with open(os.path.join(s, "stats.json")) as f:
                st = json.load(f)
            stats = stats or st
            n_docs += st["n_docs"]
            total_tokens += st["total_tokens"]
            self._segment_avgdls.append(float(st["avgdl"]))
        self.stats = {**stats, "n_docs": n_docs, "total_tokens": total_tokens,
                      "avgdl": (total_tokens / n_docs) if n_docs else 0.0}
        self.n_docs = n_docs
        self.k1 = self.stats["k1"]
        self.b = self.stats["b"]
        self.avgdl = self.stats["avgdl"] or 1.0
        self.max_query_terms = self.stats.get("max_query_terms", 50)
        self.max_results = self.stats.get("max_results", 50)
        self.lazy_min_df = 1_000_000
        self._postings_df = spark.read.parquet(*[f"{s}/postings" for s in segment_dirs])
        self._term_stats_df = spark.read.parquet(*[f"{s}/term_stats" for s in segment_dirs])
        self._docs_df = spark.read.parquet(*[f"{s}/docs" for s in segment_dirs])
        self._cache = {}
        self._df_cache = {}
        self._dict_complete = False
        self._doclens = None
        self._blooms = False

    def _bloom_dirs(self):
        return list(self._segment_dirs)

    def _doclens_df(self):
        return self.spark.read.parquet(*[f"{s}/doclens" for s in self._segment_dirs])

    @property
    def doclens(self):
        if self._doclens is None:
            import numpy as np

            pdf = self.spark.read.parquet(*[f"{s}/doclens" for s in self._segment_dirs]).toPandas()
            arr = np.zeros(self.n_docs, dtype=np.int64)
            arr[pdf["doc_id"].to_numpy()] = pdf["dl"].to_numpy()
            self._doclens = arr
        return self._doclens

    # fetch_terms: inherited — per-term df/max_weight are derived from the
    # shard rows themselves (summed/maxed), which is segment-correct by
    # construction; the union read interleaves shard rows and SearchEngine's
    # (salt, first-block) ordering merges disjoint docID ranges.

    def search_bm25_wand(self, q, exact_total: bool = True):
        """Pruned kernel is only rank-safe when block-max weights were baked
        under the live avgdl: each segment baked w = tf/(tf + k1(1-b+b·dl/avgdl_seg)),
        so when global avgdl > avgdl_seg the stored maxima UNDERESTIMATE the
        true upper bounds and WAND could silently prune true top-k docs.
        Enforce the compact()-first contract instead of trusting callers:
        delegate to exhaustive (still exact) scoring unless every segment's
        avgdl matches the global one (e.g. single segment, or post-compact)."""
        fresh = all(abs(st - self.avgdl) < 1e-9 for st in self._segment_avgdls)
        if not fresh:
            return self.search_bm25(q)
        return super().search_bm25_wand(q, exact_total=exact_total)
