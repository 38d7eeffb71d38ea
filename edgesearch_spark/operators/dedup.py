"""Deduplication operators for training-data pipelines.

Four families, all shaped for 100 TB inputs (never a cross join; candidate
generation always goes through an equi-join key):

  exact_dedup            — hash-groupBy on content sha256
  shingle_jaccard_pairs  — exact n-gram Jaccard via self-join on shingle
                           (the oracle for the approximate methods)
  minhash_lsh_candidates — MinHash signatures → banded LSH buckets →
                           equi-join candidates (misses only what LSH misses)
  simhash                — 64-bit SimHash fingerprints (hamming-closeness
                           clustering is a fixed-radius join on rotated keys)

All JVM built-ins (xxhash64, explode, windowed aggregation) — no Python in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import _tokens_col


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(sha, n_docs, keep_doc_id): one row per distinct content; duplicates
    collapse to the minimum id (deterministic survivor)."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("sha"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_doc_id"))
    )


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct n-token shingles per doc: (doc_id, shingle)."""
    toks = df.select(F.col(id_col).alias("doc_id"), _tokens_col(text_col).alias("ts"))
    sh = toks.filter(F.size("ts") >= n).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - n),
                lambda i: F.concat_ws(" ", F.slice(F.col("ts"), i + 1, n)),
            )
        ).alias("shingle"),
    )
    return sh.distinct()


def shingle_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard near-dup pairs (a < b, jaccard ≥ threshold).

    Scale shape: |∩| computed by self-equi-join on shingle (shuffle on the
    shingle key; hot shingles are naturally rare for n ≥ 3), set sizes by a
    pre-aggregation joined in afterwards — never materializes doc×doc."""
    sh = _shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("common") / (F.col("sa.sz") + F.col("sb.sz") - F.col("common"))
    return (
        inter.join(sa, F.col("a") == F.col("sa.doc_id"))
        .join(sb, F.col("b") == F.col("sb.doc_id"))
        .filter(jac >= threshold)
        .select("a", "b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """(doc_id, seed, minhash): MinHash over shingle sets via seeded xxhash64
    (h_i(s) = xxhash64(s, i) — an independent-ish family, all JVM-side)."""
    sh = _shingles(df, id_col, text_col, n)
    seeds = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed")
    hashed = sh.select("doc_id", "shingle", seeds).withColumn(
        "h", F.xxhash64(F.col("shingle"), F.col("seed"))
    )
    return hashed.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    band_size: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) from banded MinHash LSH.

    bands = num_hashes / band_size; docs collide if any band's signature
    slice matches exactly. Candidates come from a self-equi-join on
    (band, band_hash) — the bucket key — so cost scales with bucket sizes,
    not doc pairs."""
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = (
        sig.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.xxhash64(F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws(":", "seed", "minhash"))))).alias("band_hash"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign of the tf-weighted sum of each term-hash
    bit. (doc_id, simhash long). Bit explosion is 64× on (doc, term) rows but
    stays JVM-side; near-dup docs differ in few bits (tested via hamming)."""
    from ..tokenizer import tokenize_pairs

    pairs = tokenize_pairs(df, id_col, text_col).withColumn("h", F.xxhash64("term"))
    bits = pairs.select(
        "doc_id", "tf", "h",
        F.explode(F.array(*[F.lit(j) for j in range(64)])).alias("j"),
    ).withColumn(
        # shiftright/shiftleft builtins need literal shift amounts; use SQL
        # expressions for the column-valued shift
        "contrib",
        F.col("tf") * (F.expr("(h >> j) & 1") * 2 - 1),
    )
    bitsum = bits.groupBy("doc_id", "j").agg(F.sum("contrib").alias("s"))
    return (
        bitsum.withColumn("bitval", F.when(F.col("s") > 0, F.expr("CAST(1 AS BIGINT) << j")).otherwise(F.lit(0).cast("long")))
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def hamming64(a: F.Column, b: F.Column) -> F.Column:
    """Popcount of XOR — bit_count is native in Spark 3.4+."""
    return F.bit_count(a.bitwiseXOR(b))
