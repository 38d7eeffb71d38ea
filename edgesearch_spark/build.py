"""Index build pipeline — the Spark-native replacement for the reference's
single-process builder (reference: src/build/mod.rs:43-137).

Reference flow (all in one process): stream (doc, terms) → dict-encode →
invert into Roaring bitmaps → sort terms → serialize → pack 25 MiB BST
chunks. Our flow, as declarative Spark stages (three shuffles total):

  docs      corpus → deterministic docID (range-sort, docids.py) → sha256
            invariant → parquet sorted by doc_id            [shuffle: range]
  stats     tokenize (JVM split/explode) → N, avgdl, totals [reduce only]
  terms     groupBy(term) → df, cf, max BM25 tf-weight      [shuffle: term]
            (the reference computes df and drops it — src/build/mod.rs:62,88;
            we keep it: it is the BM25 idf input)
  postings  tokenize+pack (bucket = hash(term,salt) blobs) → repartition
            (bucket) → numpy sort + adaptive block encode (mapInArrow)
            → parquet range-sorted by (term, salt)          [shuffle: term+salt]
  blooms    absent-term bloom sidecar (bloom.py)            [reduce only]

Skew: a plain groupBy(term) would put a hot term's entire posting list in
one task (the `import`-class problem at 10^12 files). The salt — a docID
*range* bucket, not a hash — caps every (term, salt) group at 2^salt_shift
postings AND makes shard merge a pure concatenation (shards never
interleave), so the final postings table keys on (term, salt) and no second
merge shuffle is needed at all. Query-time reads all salts of a term (they
are adjacent in the range-sorted table) and concatenates.

Each stage commits a checkpoint manifest (_manifest/<stage>.json) with
lineage + row counts + wall time; a rerun skips completed stages (the
reference's resumable-upload cursor pattern, deployer/cloudflare/src/deploy.ts:10-56,
generalized to per-stage lineage per the north rule).
"""

from __future__ import annotations

import json
import math
import os
import time
from collections.abc import Iterator, Sequence
from dataclasses import asdict, dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .docids import assign_doc_ids
from .tokenizer import tokenize_pairs

STAGES = ("docs", "stats", "postings", "terms")

POSTINGS_SCHEMA = (
    "term string, salt long, df long, cf long, "
    "block_first_doc array<long>, block_max_doc array<long>, block_count array<int>, "
    "block_offset array<long>, block_max_weight array<float>, block_kind array<int>, "
    "block_max_tf array<int>, payload binary"
)

POSITIONS_SCHEMA = "term string, salt long, df long, payload binary"


def make_positions_encoder(salt_shift: int = 16):
    """mapInPandas over a (term, doc-range)-hash-partitioned,
    (term, doc_id, pos)-sorted position stream: (term, salt) group
    boundaries found vectorized, carry buffer stitches groups spanning
    Arrow batches (make_stream_encoder's shape, positional payload)."""
    from .codec import encode_positions_groups

    def _emit(terms, salts, docs, poss, gstarts) -> pd.DataFrame:
        payloads, nd = encode_positions_groups(docs, poss, gstarts)
        return pd.DataFrame(
            {
                "term": terms[gstarts],
                "salt": salts[gstarts],
                "df": nd,
                "payload": payloads,
            }
        )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy()
            salts = pdf["doc_id"].to_numpy(np.int64) >> salt_shift
            chg = np.flatnonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])) + 1
            if chg.size == 0:
                carry = pdf
                continue
            last_head = chg[-1]
            carry = pdf.iloc[last_head:]
            head = pdf.iloc[:last_head]
            yield _emit(
                terms[:last_head], salts[:last_head],
                head["doc_id"].to_numpy(np.int64), head["pos"].to_numpy(np.int64),
                np.concatenate([[0], chg[:-1]]).astype(np.int64),
            )
        if carry is not None and len(carry):
            terms = carry["term"].to_numpy()
            salts = carry["doc_id"].to_numpy(np.int64) >> salt_shift
            chg = np.flatnonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])) + 1
            yield _emit(
                terms, salts,
                carry["doc_id"].to_numpy(np.int64), carry["pos"].to_numpy(np.int64),
                np.concatenate([[0], chg]).astype(np.int64),
            )

    return encode


@dataclass
class IndexConfig:
    k1: float = 1.2  # Robertson defaults; the reference defines no override (SURVEY.md §0)
    b: float = 0.75
    block_size: int = 128
    salt_shift: int = 16  # shard = docID range of 2^16 docs (Roaring high-key analogue)
    # write-side size budget (reference packs ≤25 MiB chunks,
    # src/build/chunks/bst.rs:86-105): postings files target this many bytes
    # via maxRecordsPerFile derived from measured bytes/row, and row groups
    # stay small enough that term-range pruning keeps sub-file granularity.
    target_file_bytes: int = 32 << 20
    target_rowgroup_bytes: int = 8 << 20
    num_partitions: int | None = None
    max_query_terms: int = 50  # reference default, src/main.rs:16
    max_results: int = 50  # reference default, src/main.rs:15
    idf: str = "lucene"  # ln(1 + (N-df+0.5)/(df+0.5)) — non-negative variant
    postings_impl: str = "pack"  # 'pack' (blob shuffle, fastest) | 'arrow' | 'sortstream' | 'collect'
    # demo-convention normalization (build.ts:14-29,50): term remapping
    # (ms→microsoft style) and `{field}_` term prefixing. Honored by the
    # 'arrow' and 'sortstream' tokenizers (parity-tested byte-identical);
    # the JVM 'collect' tokenizer has no normalization hook → build refuses.
    word_map: dict | None = None
    field_prefix: str | None = None
    # source-code mode: insert identifier-boundary markers (camelCase /
    # snake_case / acronym / digit, functions/code.py) into the
    # TOKENIZATION input, so `user` finds `getUserName`. The docs store
    # keeps the original content (sha256 invariant untouched); doclens and
    # BM25 statistics count subtokens, consistently with the index.
    split_identifiers: bool = False
    # hot-phrase acceleration (Lucene common-grams idea): index the ADJACENT
    # token pair "t1 t2" for every pair whose BOTH terms have df ≥ this
    # threshold. Phrase queries over hot term pairs then AND exact-adjacency
    # postings instead of each term's huge doc set — candidates shrink from
    # |docs with both terms| to |docs with the pair adjacent|. None = no
    # sidecar. Hot-term count is bounded by total_postings / bigram_min_df,
    # so the driver-collected hot list stays metadata-scale by construction.
    bigram_min_df: int | None = None
    # trigram sidecar over DROPPED (>MAX_TERM_BYTES) alphanumeric runs:
    # index_regex_search can then demand per-literal trigram evidence from
    # overlong-flagged docs instead of unioning the whole flagged set into
    # its candidates (on minified-JS/base64 corpora the flagged set is a
    # large corpus fraction and the wholesale union degrades the operator
    # toward a scan — VERDICT r5 'what's wrong #1'). Cheap by construction:
    # only flagged docs' runs are scanned, and the term space is ≤ 36³
    # lowercase-alnum trigrams.
    overlong_trigrams: bool = True
    # positional sidecar: per-(term, salt) delta-varint position blobs
    # (positions = 0-based indexes into the drop-filtered token stream).
    # Enables exact arbitrary-length phrase match and NEAR/slop proximity
    # queries straight from the index — no docs-store verify join — and,
    # unlike the bigram sidecar, is sound on normalized builds (word_map /
    # field_prefix / split_identifiers): positions live in the NORMALIZED
    # stream, the same stream the postings index.
    positions: bool = False
    # 'pack' (binary-blob shuffle — the postings 'pack' discipline applied
    # to the positions stage, byte-identical output) | 'sortstream' (the
    # historical posexplode → row shuffle → mapInPandas path). The row path
    # ships every token occurrence through the JVM→Python Arrow crossing —
    # the conversion floor the postings stage removed in round 3 (VERDICT
    # r7 #1: positions stage 104-148 s vs postings 13-30 s on one corpus).
    positions_impl: str = "pack"


@dataclass
class StageMetrics:
    stage: str
    rows: int
    seconds: float
    extra: dict = field(default_factory=dict)


def _manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, "_manifest", f"{stage}.json")


def _stage_done(out_dir: str, stage: str) -> bool:
    return os.path.exists(_manifest_path(out_dir, stage))


def _commit_stage(out_dir: str, m: StageMetrics, lineage: dict) -> None:
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    tmp = _manifest_path(out_dir, m.stage) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({**asdict(m), "lineage": lineage}, f, indent=2)
    os.replace(tmp, _manifest_path(out_dir, m.stage))  # atomic commit


def load_stats(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "stats.json")) as f:
        return json.load(f)


def idf_value(n_docs: int, df: np.ndarray | int, variant: str = "lucene") -> np.ndarray | float:
    """BM25 idf. 'lucene': ln(1 + (N - df + 0.5)/(df + 0.5)), always ≥ 0.
    The reference never scores; this pins the scoring contract for oracles."""
    if variant != "lucene":
        raise ValueError(f"unknown idf variant {variant}")
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5)) if not np.isscalar(df) else math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_weight_col(k1: float, b: float, avgdl: float) -> F.Column:
    """Per-posting BM25 tf-weight w = tf / (tf + k1*(1 - b + b*dl/avgdl)).
    Score contribution = idf * (k1+1) * w. Pure JVM column expression."""
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    return (F.col("tf").cast("double") / denom).cast("float")


def make_encoder(block_size: int):
    """Return a mapInPandas function encoding (term, salt, doc_ids[], tfs[],
    ws[]) rows into posting-block rows. The arrays arrive as primitive Arrow
    lists (field extraction happened JVM-side), so each cell is already a
    numpy array — the Python side only runs the vectorized codec, never
    iterating per posting."""

    from .codec import encode_postings_batch

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs_list = [np.asarray(d, dtype=np.int64) for d in pdf["doc_ids"]]
            tfs_list = [np.asarray(t, dtype=np.int64) for t in pdf["tfs"]]
            ws_list = [np.asarray(w, dtype=np.float32) for w in pdf["ws"]]
            pbs = encode_postings_batch(docs_list, tfs_list, ws_list, block_size=block_size)
            yield pd.DataFrame(
                {
                    "term": pdf["term"].to_numpy(),
                    "salt": pdf["salt"].to_numpy(),
                    "df": np.fromiter((d.size for d in docs_list), dtype=np.int64, count=len(docs_list)),
                    "cf": np.fromiter((int(t.sum()) for t in tfs_list), dtype=np.int64, count=len(tfs_list)),
                    "block_first_doc": [pb.first_doc for pb in pbs],
                    "block_max_doc": [pb.max_doc for pb in pbs],
                    "block_count": [pb.counts for pb in pbs],
                    "block_offset": [pb.offsets for pb in pbs],
                    "block_max_weight": [pb.max_weight for pb in pbs],
                    "block_kind": [pb.kinds.astype(np.int32) for pb in pbs],
                    "block_max_tf": [pb.max_tf for pb in pbs],
                    "payload": [pb.payload for pb in pbs],
                }
            )

    return encode


def make_stream_encoder(block_size: int, salt_shift: int = 16):
    """mapInPandas over a (term, doc-range)-hash-partitioned, (term, doc_id)-
    sorted flat posting stream: group boundaries are found vectorized
    (np.split on change points) and a carry buffer stitches groups that span
    Arrow batch boundaries. One shuffle total — no collect_list buffers, no
    per-group JVM aggregation state; the salt column never travels (it is
    doc_id >> salt_shift, recomputed here). This is SURVEY.md B9's planned
    shape (repartition → sortWithinPartitions → vectorized encode)."""
    from .codec import encode_postings_batch

    def _emit(terms, salts, docs, tfs, ws, bounds) -> pd.DataFrame:
        docs_list = np.split(docs, bounds)
        tfs_list = np.split(tfs, bounds)
        ws_list = np.split(ws, bounds)
        heads = np.concatenate([[0], bounds])
        pbs = encode_postings_batch(docs_list, tfs_list, ws_list, block_size=block_size)
        return pd.DataFrame(
            {
                "term": terms[heads],
                "salt": salts[heads],
                "df": np.fromiter((d.size for d in docs_list), np.int64, count=len(docs_list)),
                "cf": np.fromiter((int(t.sum()) for t in tfs_list), np.int64, count=len(tfs_list)),
                "block_first_doc": [pb.first_doc for pb in pbs],
                "block_max_doc": [pb.max_doc for pb in pbs],
                "block_count": [pb.counts for pb in pbs],
                "block_offset": [pb.offsets for pb in pbs],
                "block_max_weight": [pb.max_weight for pb in pbs],
                "block_kind": [pb.kinds.astype(np.int32) for pb in pbs],
                "block_max_tf": [pb.max_tf for pb in pbs],
                "payload": [pb.payload for pb in pbs],
            }
        )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy()
            salts = pdf["doc_id"].to_numpy(np.int64) >> salt_shift
            # change points where (term, salt) differs from previous row
            chg = np.flatnonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])) + 1
            if chg.size == 0:
                carry = pdf  # whole batch is one (possibly continuing) group
                continue
            last_head = chg[-1]
            carry = pdf.iloc[last_head:]
            head = pdf.iloc[:last_head]
            yield _emit(
                terms[:last_head],
                salts[:last_head],
                head["doc_id"].to_numpy(np.int64),
                head["tf"].to_numpy(np.int64),
                head["w"].to_numpy(np.float32),
                chg[:-1],
            )
        if carry is not None and len(carry):
            terms = carry["term"].to_numpy()
            salts = carry["doc_id"].to_numpy(np.int64) >> salt_shift
            chg = np.flatnonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])) + 1
            yield _emit(
                terms, salts,
                carry["doc_id"].to_numpy(np.int64),
                carry["tf"].to_numpy(np.int64),
                carry["w"].to_numpy(np.float32),
                chg,
            )

    return encode


def _tune_split_size(spark: SparkSession, path: str, n_part: int) -> None:
    """Size parquet input splits to the data: every tokenize stage scans the
    docs table, and with the stock 128 MB maxPartitionBytes a bench-sized
    corpus packs into 2-4 splits — leaving all but a few cores idle no
    matter the parallelism (measured: local[32] slower than local[8]).
    Target ≈ 2 splits per core, clamped to [4 MB, 128 MB] so a genuinely
    large corpus keeps production-sized splits."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    target = max(4 << 20, min(128 << 20, total // max(1, n_part * 2)))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(int(target)))
    spark.conf.set("spark.sql.files.openCostInBytes", str(int(max(64 << 10, target // 8))))
    # keep AQE's post-shuffle coalescing from folding the encode stage onto a
    # handful of cores: advisory size scales with the same data-size estimate
    # (pairs blow up ~4× over docs bytes; target 2 partitions per core)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(int(max(1 << 20, min(64 << 20, total * 4 // max(1, n_part * 2))))))


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    config: IndexConfig | None = None,
    order_cols: Sequence[str] | None = None,
    doc_id_col: str | None = None,
    content_col: str = "content",
    resume: bool = True,
    stop_after: str | None = None,
) -> list[StageMetrics]:
    """Build the full index at ``out_dir``: docs/, term_stats/, postings/,
    stats.json, _manifest/. Either ``doc_id_col`` names an existing dense id
    column, or ``order_cols`` defines the total order for docID assignment
    (the reference's ranking-baked-into-docID contract, SURVEY.md B4)."""
    cfg = config or IndexConfig()
    if (doc_id_col is None) == (order_cols is None):
        raise ValueError("exactly one of doc_id_col / order_cols required")
    if (cfg.word_map or cfg.field_prefix) and cfg.postings_impl == "collect":
        raise ValueError("word_map/field_prefix require postings_impl 'pack', 'arrow' or 'sortstream'")
    if cfg.bigram_min_df is not None and (
            cfg.word_map or cfg.field_prefix or cfg.split_identifiers):
        # fail BEFORE any stage runs: stage-6-only validation would let an
        # IncrementalIndexer with this config ingest fine (segments strip
        # the sidecar) and then burn a full compaction merge before dying
        raise ValueError(
            "bigram_min_df requires a plain tokenization build "
            "(no word_map/field_prefix/split_identifiers)"
        )
    os.makedirs(out_dir, exist_ok=True)
    n_part = cfg.num_partitions or spark.sparkContext.defaultParallelism
    metrics: list[StageMetrics] = []
    docs_path = os.path.join(out_dir, "docs")
    terms_path = os.path.join(out_dir, "term_stats")
    postings_path = os.path.join(out_dir, "postings")

    def stage(name: str):
        return resume and _stage_done(out_dir, name)

    # ---- stage 1: docs store (reference: src/build/mod.rs:124-137) ----
    if not stage("docs"):
        t0 = time.monotonic()
        if doc_id_col is not None:
            docs = corpus.withColumn("doc_id", F.col(doc_id_col).cast("long")) if doc_id_col != "doc_id" else corpus
        else:
            docs = assign_doc_ids(corpus, order_cols, num_partitions=n_part)
        cache = getattr(docs, "_docid_cache", None)
        docs = docs.withColumn("sha256", F.sha2(F.col(content_col), 256))
        # Layout: n_part range-sorted files. assign_doc_ids' output is
        # ALREADY docID-range-partitioned (partition p is the contiguous
        # block [base_p, base_p+cnt_p) by the prefix-sum construction) and
        # sorted within, so the order_cols path skips the explicit
        # repartitionByRange — that was a third full shuffle of the
        # content bytes for a layout the data already had (the
        # sortWithinPartitions stays as a cheap already-sorted pass and
        # layout guard). A user-supplied doc_id column has arbitrary
        # layout and keeps the explicit range shuffle (which AQE respects,
        # so small inputs still get n_part files, not a coalesced handful).
        # the docID invariant check rides the WRITE itself (Observation —
        # aggregates computed as rows stream to parquet), so the store is
        # never re-scanned just to validate: the engine's norms cache and
        # positional docID semantics assume a DENSE 0..n-1 id space, and a
        # user-supplied doc_id_col with gaps or duplicates would corrupt
        # results silently. min/max are exact; distinctness is approximate
        # (1% rsd — exact would be a shuffle).
        from pyspark.sql import Observation

        if doc_id_col is None:  # assign_doc_ids output: already range-laid-out
            layout = docs.sortWithinPartitions("doc_id")
        else:
            layout = docs.repartitionByRange(n_part, "doc_id").sortWithinPartitions("doc_id")
        obs = Observation("docid_invariants")
        (layout.observe(obs,
                        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("lo"),
                        F.max("doc_id").alias("hi"),
                        F.approx_count_distinct("doc_id", 0.01).alias("nd"))
               .write.mode("overwrite").parquet(docs_path))
        if cache is not None:
            cache.unpersist()
        chk = obs.get
        n_docs = int(chk["n"] or 0)
        if n_docs:
            # contiguous [lo, lo+n-1]: standalone builds start at 0, segment
            # builds (streaming/incremental.py) at their docID-space offset
            if int(chk["lo"]) < 0 or int(chk["hi"]) - int(chk["lo"]) != n_docs - 1:
                raise ValueError(
                    f"doc_id must be a dense contiguous range: got min={chk['lo']} "
                    f"max={chk['hi']} for n={n_docs} rows (use order_cols= to have "
                    f"build assign docIDs)"
                )
            if int(chk["nd"]) < 0.95 * n_docs:
                raise ValueError(
                    f"doc_id looks non-unique: ~{chk['nd']} distinct of {n_docs} rows"
                )
        dt = time.monotonic() - t0
        m = StageMetrics("docs", n_docs, dt, {"docs_per_sec": n_docs / dt if dt else None})
        metrics.append(m)
        _commit_stage(out_dir, m, {"input": "corpus", "output": docs_path})
    if stop_after == "docs":
        return metrics

    _tune_split_size(spark, docs_path, n_part)
    docs_df = spark.read.parquet(docs_path)
    if cfg.split_identifiers:
        # applies to tokenization inputs only — stage 1 (original content)
        # is already on disk
        from .functions.code import identifier_marked_col

        docs_df = docs_df.withColumn(content_col, identifier_marked_col(content_col))
    pairs = tokenize_pairs(docs_df, "doc_id", content_col)

    # ---- stage 2: corpus stats (N, avgdl) + doc-length norms ----
    # dl per doc is the BM25 length norm (Lucene-norms analogue). Stored as
    # its own tiny table sorted by doc_id; the driver query kernel caches it
    # as one numpy array, the distributed path joins it. One tokenize pass:
    # N, total tokens and avgdl all come from the doclens read-back, so this
    # stage never shuffles the exploded pairs.
    doclens_path = os.path.join(out_dir, "doclens")
    if not stage("stats"):
        t0 = time.monotonic()
        from .tokenizer import doc_length_col

        # the docs parquet is range-sorted by doc_id, so the narrow map
        # below inherits that order — write without reshuffling. The write
        # also observes whether ANY doc holds an alphanumeric run longer
        # than MAX_TERM_BYTES: such runs are DROPPED from the token stream,
        # so a regex literal occurring only inside one exists in no indexed
        # term and index_regex_search's dictionary pruning would silently
        # drop the match — the engine routes regex to the scan when this
        # flag is set (code/base64-heavy corpora).
        from pyspark.sql import Observation

        from .tokenizer import MAX_TERM_BYTES

        ol = F.when(
            F.col(content_col).rlike(f"[a-zA-Z0-9]{{{MAX_TERM_BYTES + 1},}}"), 1
        ).otherwise(0)
        obs = Observation("overlong_runs")
        # the PER-DOC flag is stored in doclens (one tinyint-ish column):
        # index_regex_search unions flagged docs into its candidate set, so
        # regex stays index-accelerated on code/base64-heavy corpora instead
        # of falling back to a full scan (the flagged set is the only place
        # a literal can hide outside the dictionary)
        (docs_df.select("doc_id", doc_length_col(content_col).alias("dl"),
                        ol.cast("int").alias("ol"))
                .observe(obs, F.max("ol").alias("ol"),
                         F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tokens"))
                .write.mode("overwrite").parquet(doclens_path))
        # N / total tokens ride the write Observation — no read-back job
        got = obs.get
        n_docs = int(got["n"] or 0)
        total_tokens = int(got["tokens"] or 0)
        avgdl = (total_tokens / n_docs) if n_docs else 0.0
        stats = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "k1": cfg.k1,
            "b": cfg.b,
            "idf": cfg.idf,
            "block_size": cfg.block_size,
            "salt_shift": cfg.salt_shift,
            "max_query_terms": cfg.max_query_terms,
            "max_results": cfg.max_results,
            "split_identifiers": cfg.split_identifiers,
            # a word_map rewrites tokens (ms -> microsoft), so the
            # "every pattern literal survives inside some indexed term"
            # invariant index_regex_search relies on does not hold —
            # record the MAP ITSELF (truthiness keeps the regex-routing
            # checks working) so scan-side fallbacks can rebuild the
            # normalized token stream (ADVICE r7: the per-segment
            # positional fallback was rebuilding the RAW stream, silently
            # dropping matches on normalized mixed-coverage builds).
            # False (not {}) when unset, preserving the old falsy shape.
            "word_map": dict(cfg.word_map) if cfg.word_map else False,
            "field_prefix": cfg.field_prefix,
            "content_col": content_col,
            "has_overlong_runs": bool(got["ol"] or 0),
        }
        tmp = os.path.join(out_dir, "stats.json.tmp")
        with open(tmp, "w") as f:
            json.dump(stats, f, indent=2)
        os.replace(tmp, os.path.join(out_dir, "stats.json"))
        dt = time.monotonic() - t0
        m = StageMetrics("stats", n_docs, dt, stats)
        metrics.append(m)
        _commit_stage(out_dir, m, {"input": docs_path, "output": ["stats.json", doclens_path]})
    if stop_after == "stats":
        return metrics

    stats = load_stats(out_dir)
    avgdl = stats["avgdl"] or 1.0
    w_col = tf_weight_col(cfg.k1, cfg.b, avgdl)

    # ---- stage 3: salted posting blocks ----
    if not stage("postings"):
        t0 = time.monotonic()
        from pyspark import StorageLevel

        if cfg.postings_impl == "pack":
            # binary-blob shuffle: the tokenizer pre-packs each
            # (hash(term), salt)-bucket of a batch into one blob, so the
            # shuffle and BOTH Arrow crossings move thousands of binary rows
            # instead of tens of millions of posting rows — removing the
            # JVM→Python row-conversion floor the profiler identified
            # (BENCH/BASELINE.md round-3 substage table). The encoder sorts
            # each partition in numpy, so the JVM sort disappears too.
            from .arrow_pipeline import make_pack_encoder, tokenize_pack_arrow

            packed = tokenize_pack_arrow(
                docs_df, doc_id_col="doc_id", content_col=content_col,
                n_buckets=16 * n_part, salt_shift=cfg.salt_shift,
                k1=cfg.k1, b=cfg.b, avgdl=avgdl,
                word_map=cfg.word_map, field_prefix=cfg.field_prefix,
            )
            stream = packed.repartition(4 * n_part, "bucket")
            encoded = stream.mapInArrow(
                make_pack_encoder(cfg.block_size, cfg.salt_shift), schema=POSTINGS_SCHEMA
            )
        elif cfg.postings_impl == "arrow":
            # zero-PyObject hot path: Arrow-native tokenizer + encoder
            # (arrow_pipeline.py) around the same single (term, salt) shuffle
            from .arrow_pipeline import make_stream_encoder_arrow, tokenize_pairs_arrow

            p = tokenize_pairs_arrow(
                docs_df, "doc_id", content_col,
                word_map=cfg.word_map, field_prefix=cfg.field_prefix,
            )
            slim = p.withColumn("w", w_col).select("term", "doc_id", "tf", "w")
            # The salt never travels: it hashes as a partitioning EXPRESSION
            # (doc_id >> shift) and, being monotone in doc_id, sorting by
            # (term, doc_id) already yields (term, salt, doc_id) order — the
            # encoder recomputes it in numpy. 8 fewer bytes per shuffled row
            # and one fewer sort key (~14% off shuffle+transfer at 55M rows).
            # 4 encode tasks per core: smaller sorts, tighter task-memory
            # bound, better stragglers — measured ~10% on the 1M corpus and
            # the safe shape at 100× (task size is corpus-independent).
            stream = slim.repartition(
                4 * n_part, "term", F.shiftright(F.col("doc_id"), cfg.salt_shift)
            ).sortWithinPartitions("term", "doc_id")
            encoded = stream.mapInArrow(
                make_stream_encoder_arrow(cfg.block_size, cfg.salt_shift), schema=POSTINGS_SCHEMA
            )
        elif cfg.postings_impl == "sortstream":
            # one-shuffle path: tf computed inside the Arrow tokenizer (no
            # explode+agg shuffle), then a single hash repartition on
            # (term, salt) + in-partition sort feeds the streaming encoder
            from .tokenizer import tokenize_pairs_pandas

            p = tokenize_pairs_pandas(
                docs_df, "doc_id", content_col,
                word_map=cfg.word_map, field_prefix=cfg.field_prefix,
            )
            slim = p.withColumn("w", w_col).select("term", "doc_id", "tf", "w")
            stream = slim.repartition(
                4 * n_part, "term", F.shiftright(F.col("doc_id"), cfg.salt_shift)
            ).sortWithinPartitions("term", "doc_id")
            encoded = stream.mapInPandas(
                make_stream_encoder(cfg.block_size, cfg.salt_shift), schema=POSTINGS_SCHEMA
            )
        else:
            salted = (
                pairs.withColumn("w", w_col)
                .withColumn("salt", F.shiftright(F.col("doc_id"), cfg.salt_shift).cast("long"))
            )
            grouped = (
                salted.groupBy("term", "salt")
                .agg(F.sort_array(F.collect_list(F.struct("doc_id", "tf", "w"))).alias("ps"))
                .select(
                    "term",
                    "salt",
                    # unzip JVM-side so Arrow ships primitive arrays, not structs
                    F.transform("ps", lambda x: x["doc_id"]).alias("doc_ids"),
                    F.transform("ps", lambda x: x["tf"]).alias("tfs"),
                    F.transform("ps", lambda x: x["w"]).alias("ws"),
                )
            )
            encoded = grouped.mapInPandas(make_encoder(cfg.block_size), schema=POSTINGS_SCHEMA)
        # persist before the range write: repartitionByRange's boundary-
        # sampling pass would otherwise re-run the whole tokenize→shuffle→
        # encode pipeline a second time
        encoded = encoded.persist(StorageLevel.MEMORY_AND_DISK)
        # size budget (B12): measure bytes/row off the persisted frame (this
        # also materializes the cache ahead of boundary sampling), then cap
        # records per output file so files land near target_file_bytes even
        # when a range partition holds far more — at 100× scale an uncapped
        # range partition writes multi-GB files that defeat pruning.
        est = encoded.agg(
            F.count(F.lit(1)).alias("rows"), F.sum(F.octet_length("payload")).alias("bytes")
        ).collect()[0]
        enc_rows, enc_bytes = int(est["rows"] or 0), int(est["bytes"] or 0)
        # block metadata arrays add ~29 B/block ≈ payload-order overhead; 1.3×
        bytes_per_row = max(64.0, 1.3 * enc_bytes / max(1, enc_rows))
        max_rec = max(1, int(cfg.target_file_bytes / bytes_per_row))
        from pyspark.sql import Observation

        pobs = Observation("postings_stats")
        (encoded.repartitionByRange(n_part, "term", "salt").sortWithinPartitions("term", "salt")
                .observe(pobs, F.count(F.lit(1)).alias("rows"), F.sum("df").alias("postings"),
                         F.sum(F.octet_length("payload")).alias("bytes"))
                .write.mode("overwrite")
                .option("maxRecordsPerFile", max_rec)
                .option("parquet.block.size", cfg.target_rowgroup_bytes)
                .parquet(postings_path))
        encoded.unpersist()
        agg = pobs.get  # stats ride the write — no read-back scan of the table
        dt = time.monotonic() - t0
        m = StageMetrics(
            "postings", int(agg["rows"]), dt,
            {"total_postings": int(agg["postings"] or 0), "payload_bytes": int(agg["bytes"] or 0),
             "postings_per_sec": (agg["postings"] or 0) / dt if dt else None},
        )
        metrics.append(m)
        _commit_stage(out_dir, m, {"input": docs_path, "output": postings_path})
    if stop_after == "postings":
        return metrics

    # ---- stage 4: term dictionary / stats (df the reference drops: mod.rs:62,88) ----
    # Derived from the postings table, not from re-tokenized pairs: per-term
    # df/cf are sums over salt shards and max_weight is the max of the stored
    # block maxima — a reduce over the (small) postings table instead of a
    # second full shuffle of every (doc, term) pair.
    if not stage("terms"):
        t0 = time.monotonic()
        post_df = spark.read.parquet(postings_path)
        term_stats = (
            post_df.groupBy("term")
            .agg(
                F.sum("df").alias("df"),
                F.sum("cf").alias("cf"),
                F.max(F.array_max("block_max_weight")).alias("max_weight"),
            )
        )
        from pyspark.sql import Observation

        tobs = Observation("terms_count")
        (term_stats.repartitionByRange(n_part, "term").sortWithinPartitions("term")
                   .observe(tobs, F.count(F.lit(1)).alias("n"))
                   .write.mode("overwrite").parquet(terms_path))
        n_terms = int(tobs.get["n"] or 0)  # rides the write — no read-back count
        dt = time.monotonic() - t0
        m = StageMetrics("terms", n_terms, dt, {"terms_per_sec": n_terms / dt if dt else None})
        metrics.append(m)
        _commit_stage(out_dir, m, {"input": postings_path, "output": terms_path})

    # ---- stage 5: absent-term bloom sidecar (term-dict scale posture) ----
    # Driver-local "definitely absent" checks at any dictionary size — the
    # reference's always-local BST lookup (wasm/bst.c) without shipping a
    # 10^9-term dictionary to the driver. See bloom.py.
    if not stage("blooms"):
        from .bloom import build_term_bloom

        t0 = time.monotonic()
        ts_df = spark.read.parquet(terms_path)
        try:  # the terms stage already counted — skip the extra job
            with open(_manifest_path(out_dir, "terms")) as f:
                n_terms = int(json.load(f)["rows"])
        except Exception:
            n_terms = ts_df.count()
        bloom_path = os.path.join(out_dir, "term_bloom")
        n_ranges = build_term_bloom(spark, ts_df, bloom_path, n_terms)
        dt = time.monotonic() - t0
        m = StageMetrics("blooms", n_ranges, dt, {"n_terms": n_terms})
        metrics.append(m)
        _commit_stage(out_dir, m, {"input": terms_path, "output": bloom_path})

    # ---- stage 6 (optional): positional sidecar ----
    # (runs BEFORE the bigram stage so the bigram pair stream can be
    # DERIVED from position blobs instead of a third corpus tokenize)
    # Per-(term, salt) delta-varint position blobs (codec.
    # encode_positions_groups). Positions are 0-based indexes into the
    # drop-filtered, NORMALIZED token stream — posexplode over the same
    # token expression the tokenizers index — so position adjacency is
    # exactly phrase adjacency and the sidecar is sound on word_map /
    # field_prefix / split_identifiers builds (where the bigram sidecar
    # must refuse). Same salt scheme as postings: shard merge stays pure
    # concatenation, the scan prunes on the range-sorted term column, and
    # the skew cap (2^salt_shift docs per shard) carries over.
    if cfg.positions and not stage("positions"):
        t0 = time.monotonic()
        pdocs = spark.read.parquet(docs_path)
        if cfg.split_identifiers:
            from .functions.code import identifier_marked_col

            pdocs = pdocs.withColumn(content_col, identifier_marked_col(content_col))
        if cfg.positions_impl == "pack":
            # binary-blob shuffle (the postings 'pack' discipline): the
            # tokenizer pre-packs each (hash(term), salt)-bucket of a batch
            # into one blob, the shuffle and both Arrow crossings move
            # thousands of binary rows instead of one row per token
            # occurrence, and the encoder sorts in numpy — the JVM never
            # row-converts the position stream (VERDICT r7 #1; byte-
            # identical output, tests/test_positions.py)
            from .arrow_pipeline import make_pos_pack_encoder, tokenize_pos_pack_arrow

            packed = tokenize_pos_pack_arrow(
                pdocs, doc_id_col="doc_id", content_col=content_col,
                n_buckets=16 * n_part, salt_shift=cfg.salt_shift,
                word_map=cfg.word_map, field_prefix=cfg.field_prefix,
            )
            enc = packed.repartition(4 * n_part, "bucket").mapInArrow(
                make_pos_pack_encoder(cfg.salt_shift), schema=POSITIONS_SCHEMA)
        else:
            from .tokenizer import norm_tokens_col

            ts = norm_tokens_col(content_col, cfg.word_map, cfg.field_prefix)
            pos_rows = pdocs.select(
                "doc_id", F.posexplode(ts).alias("pos", "term")
            ).select("term", "doc_id", F.col("pos").cast("long").alias("pos"))
            stream = pos_rows.repartition(
                4 * n_part, "term", F.shiftright(F.col("doc_id"), cfg.salt_shift)
            ).sortWithinPartitions("term", "doc_id", "pos")
            enc = stream.mapInPandas(make_positions_encoder(cfg.salt_shift),
                                     schema=POSITIONS_SCHEMA)
        positions_path = os.path.join(out_dir, "positions")
        # persist before the range write: repartitionByRange's boundary-
        # sampling pass re-executes the whole tokenize→shuffle→encode
        # pipeline a SECOND time otherwise (the postings stage has carried
        # this guard since round 3; the positions stage was paying the
        # double run — half its round-7 wall time was the sampling rerun)
        from pyspark import StorageLevel

        enc = enc.persist(StorageLevel.MEMORY_AND_DISK)
        enc.count()  # materialize ahead of boundary sampling
        from pyspark.sql import Observation

        posobs = Observation("positions_stats")
        (enc.repartitionByRange(n_part, "term", "salt").sortWithinPartitions("term", "salt")
            .observe(posobs, F.count(F.lit(1)).alias("rows"), F.sum("df").alias("postings"),
                     F.sum(F.octet_length("payload")).alias("bytes"))
            .write.mode("overwrite")
            .option("parquet.block.size", cfg.target_rowgroup_bytes)
            .parquet(positions_path))
        enc.unpersist()
        agg = posobs.get  # stats ride the write — no read-back scan
        # engine detects the sidecar from stats.json, never a fs probe
        stats_path = os.path.join(out_dir, "stats.json")
        with open(stats_path) as f:
            st = json.load(f)
        st["positions"] = True
        with open(stats_path + ".tmp", "w") as f:
            json.dump(st, f)
        os.replace(stats_path + ".tmp", stats_path)
        dt = time.monotonic() - t0
        m = StageMetrics("positions", int(agg["rows"]), dt,
                         {"total_postings": int(agg["postings"] or 0),
                          "payload_bytes": int(agg["bytes"] or 0)})
        metrics.append(m)
        _commit_stage(out_dir, m, {"input": docs_path, "output": positions_path})


    # ---- stage 7 (optional): hot-bigram sidecar (common-grams) ----
    # Adjacent-pair postings for hot×hot term pairs, in the SAME postings
    # schema/codec as the main table so the engine's pruned fetch + decode
    # path serves them unchanged. Soundness rests on the docs-store token
    # stream being byte-identical to the indexed stream, so normalizing
    # builds (word_map / field_prefix / split_identifiers rewrite tokens
    # relative to stored content) refuse the sidecar.
    if cfg.bigram_min_df is not None and not stage("bigrams"):
        t0 = time.monotonic()
        hot_df = (
            spark.read.parquet(terms_path)
            .filter(F.col("df") >= cfg.bigram_min_df).select("term")
        )
        if cfg.positions and _stage_done(out_dir, "positions"):
            # Derive the pair stream from the positional sidecar instead of
            # a THIRD corpus tokenize (the positions stage already paid the
            # tokenize): hot-term position blobs decode to kept-token
            # indexes, and two kept tokens are phrase-adjacent exactly when
            # their positions are consecutive — the same adjacency the
            # arrays_zip path below computes (both streams are the
            # drop-filtered token stream, so a dropped >MAX_TERM_BYTES run
            # collapses identically). Work scales with HOT-term postings
            # (broadcast-semi-joined before decode), not corpus tokens.
            from .sources.postings import POS_DECODED_SCHEMA, _decode_pos_rows

            pair_derivation = "positions"
            dec = (
                spark.read.parquet(os.path.join(out_dir, "positions"))
                .join(F.broadcast(hot_df), "term", "left_semi")
                .select("term", "df", "payload")
                .mapInPandas(_decode_pos_rows, schema=POS_DECODED_SCHEMA)
            )
            toks = dec.select("doc_id", "term", F.explode("positions").alias("pos"))
            perdoc = toks.groupBy("doc_id").agg(
                F.sort_array(F.collect_list(F.struct("pos", "term"))).alias("s"))
            n1 = F.greatest(F.size("s") - 1, F.lit(0))
            adj = F.filter(
                F.zip_with(
                    F.slice("s", 1, n1), F.slice("s", 2, n1),
                    lambda x, y: F.when(y["pos"] == x["pos"] + 1,
                                        F.concat_ws(" ", x["term"], y["term"]))),
                lambda v: v.isNotNull())
            pairs = (
                perdoc.select("doc_id", F.explode(adj).alias("term"))
                .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
            )
        else:
            from .tokenizer import _tokens_col

            pair_derivation = "tokenize"
            docs_df = spark.read.parquet(docs_path)
            ts = _tokens_col(content_col)
            pair = F.arrays_zip(
                ts.alias("a"),
                F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0))).alias("b"),
            )
            pairs = (
                docs_df.select("doc_id", F.explode(pair).alias("p"))
                .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .filter(F.col("b").isNotNull())
                # two broadcast semi-joins bound the pair stream to hot×hot —
                # the hot list never reaches the driver as literals
                .join(F.broadcast(hot_df).withColumnRenamed("term", "a"), "a", "left_semi")
                .join(F.broadcast(hot_df).withColumnRenamed("term", "b"), "b", "left_semi")
                .groupBy("doc_id", F.concat_ws(" ", "a", "b").alias("term"))
                .agg(F.count(F.lit(1)).alias("tf"))
            )
        slim = pairs.select("term", "doc_id", "tf", F.lit(0.0).cast("float").alias("w"))
        stream = slim.repartition(
            n_part, "term", F.shiftright(F.col("doc_id"), cfg.salt_shift)
        ).sortWithinPartitions("term", "doc_id")
        bigram_path = os.path.join(out_dir, "bigram_postings")
        (stream.mapInPandas(make_stream_encoder(cfg.block_size, cfg.salt_shift),
                            schema=POSTINGS_SCHEMA)
               .repartitionByRange(n_part, "term", "salt").sortWithinPartitions("term", "salt")
               .write.mode("overwrite")
               .option("parquet.block.size", cfg.target_rowgroup_bytes)
               .parquet(bigram_path))
        agg = spark.read.parquet(bigram_path).agg(
            F.count(F.lit(1)).alias("rows"), F.sum("df").alias("postings")).collect()[0]
        # the engine detects the sidecar from stats.json (never from a
        # filesystem probe — remote index dirs, ADVICE r4 bloom lesson)
        stats_path = os.path.join(out_dir, "stats.json")
        with open(stats_path) as f:
            st = json.load(f)
        st["bigram_min_df"] = cfg.bigram_min_df
        with open(stats_path + ".tmp", "w") as f:
            json.dump(st, f)
        os.replace(stats_path + ".tmp", stats_path)
        dt = time.monotonic() - t0
        m = StageMetrics("bigrams", int(agg["rows"]), dt,
                         {"total_postings": int(agg["postings"] or 0),
                          "min_df": cfg.bigram_min_df,
                          "pair_derivation": pair_derivation})
        metrics.append(m)
        _commit_stage(out_dir, m, {"input": docs_path, "output": bigram_path})

    # ---- stage 8 (default-on): overlong-run trigram sidecar ----
    # Literal evidence for regex over docs whose >MAX_TERM_BYTES runs were
    # DROPPED from the token stream: every maximal-alnum occurrence of a
    # required literal lies inside one run, so a literal hiding in a
    # dropped run leaves all its trigrams in that run — indexing the
    # (lowercased) trigrams of dropped runs makes flagged docs literal-
    # searchable and index_regex_search can intersect instead of union.
    # Same POSTINGS schema/codec/salting, so _decoded_for serves it
    # unchanged. A corpus with no flagged docs commits the stage with no
    # table (trivially covered — stats records rows=0).
    if cfg.overlong_trigrams and not stage("oltrigrams"):
        from .tokenizer import MAX_TERM_BYTES

        t0 = time.monotonic()
        stats_path = os.path.join(out_dir, "stats.json")
        with open(stats_path) as f:
            st = json.load(f)
        if not st.get("has_overlong_runs"):
            # stage 2 already proved no doc carries a dropped run — commit
            # the stage without touching the corpus (zero extra scan on
            # clean corpora, the common case); rows=0 tells the engine no
            # sidecar table exists to read
            n_rows, n_post, oltri_path = 0, 0, None
        else:
            fdocs = spark.read.parquet(docs_path).filter(
                F.col(content_col).rlike(f"[a-zA-Z0-9]{{{MAX_TERM_BYTES + 1},}}"))
            runs = fdocs.select(
                "doc_id",
                F.explode(F.expr(
                    f"regexp_extract_all({content_col}, "
                    f"'[a-zA-Z0-9]{{{MAX_TERM_BYTES + 1},}}', 0)")).alias("run"),
            )
            tris = (
                runs.select("doc_id", F.lower(F.col("run")).alias("lr"))
                .select("doc_id", F.explode(F.expr(
                    "transform(sequence(1, length(lr) - 2), i -> substring(lr, i, 3))"
                )).alias("term"))
                .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
            )
            slim = tris.select("term", "doc_id", "tf",
                               F.lit(0.0).cast("float").alias("w"))
            stream = slim.repartition(
                n_part, "term", F.shiftright(F.col("doc_id"), cfg.salt_shift)
            ).sortWithinPartitions("term", "doc_id")
            oltri_path = os.path.join(out_dir, "overlong_trigrams")
            enc = stream.mapInPandas(make_stream_encoder(cfg.block_size, cfg.salt_shift),
                                     schema=POSTINGS_SCHEMA)
            (enc.repartitionByRange(n_part, "term", "salt")
                .sortWithinPartitions("term", "salt")
                .write.mode("overwrite")
                .option("parquet.block.size", cfg.target_rowgroup_bytes)
                .parquet(oltri_path))
            agg = spark.read.parquet(oltri_path).agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("df").alias("postings")).collect()[0]
            n_rows, n_post = int(agg["rows"] or 0), int(agg["postings"] or 0)
        st["overlong_trigrams"] = True
        st["overlong_trigram_rows"] = n_rows
        with open(stats_path + ".tmp", "w") as f:
            json.dump(st, f)
        os.replace(stats_path + ".tmp", stats_path)
        dt = time.monotonic() - t0
        m = StageMetrics("oltrigrams", n_rows, dt, {"total_postings": n_post})
        metrics.append(m)
        _commit_stage(out_dir, m, {"input": docs_path, "output": oltri_path})

    return metrics
