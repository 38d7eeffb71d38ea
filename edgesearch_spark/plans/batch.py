"""Batch query execution: a whole table of queries against the index as ONE
DataFrame plan — the cluster-scale query mode (the reference's worker
answers one query per HTTP request; at 10^12 docs you also need "join a
million queries against the postings table once").

Semantics per query mirror the reference normal path exactly
(wasm/index.c:76-104 + the missing-term rules of script/src/main.ts:368-376):

  * require: doc must hit ALL require terms — a missing (never-indexed)
    require term makes the count unreachable ⇒ zero results, automatically;
  * contain: doc must hit ≥1 of the *existing* contain terms (missing ones
    are dropped via the term_stats broadcast join) — queries with no
    existing contain term skip the clause;
  * exclude: doc must hit none of the exclude terms;
  * exclude-only queries (no require, no existing contain): the excluded
    union IS the result (the reference quirk);
  * queries with no effective terms at all (the default-results page) are
    NOT answered here — the caller routes them to the docs table directly
    (engine default path); flagged in the output as matched=false rows? No:
    they simply produce no rows, callers check `effective` on the side.

BM25 scores use the same formula as the kernel; ranks are
(score desc, doc_id asc) per query via a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..build import load_stats
from ..sources.postings import decoded_postings, doclens_table, term_stats_table

QUERIES_SCHEMA = "query_id string, require array<string>, contain array<string>, exclude array<string>"


def _mode_terms(queries: DataFrame) -> DataFrame:
    """(query_id, term, mode) — one row per (query, term, mode)."""
    parts = []
    for mode, col in (("r", "require"), ("c", "contain"), ("e", "exclude")):
        parts.append(
            queries.select("query_id", F.explode_outer(F.array_distinct(col)).alias("term"))
            .filter(F.col("term").isNotNull())
            .withColumn("mode", F.lit(mode))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def batch_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 50,
    scored: bool = True,
) -> DataFrame:
    """→ (query_id, rank, doc_id, score): top-k per query.

    Plan shape: queries' term lists are tiny → broadcast them against the
    decoded postings (scan pruned to the union of query terms); per-
    (query_id, doc_id) aggregation evaluates the boolean clauses; BM25 via
    broadcast term idf + doclens join; window top-k per query."""
    stats = load_stats(index_dir)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"] or 1.0
    k1, b = stats["k1"], stats["b"]

    qt = _mode_terms(queries)
    all_terms = [r["term"] for r in qt.select("term").distinct().collect()]

    ts = term_stats_table(spark, index_dir).filter(F.col("term").isin(all_terms))
    # drop missing contain terms (reference rule) while keeping missing
    # require terms "required" (they make the query unsatisfiable)
    qt = qt.join(F.broadcast(ts.select("term", "df")), "term", "left")
    qt = qt.filter(~((F.col("mode") == "c") & F.col("df").isNull()))
    # a term in BOTH require and contain of one query must score once, like
    # SearchEngine/oracle (dict.fromkeys(require+contain)): flag the r-dup
    # so the c row keeps its boolean role but contributes no score
    r_terms = qt.filter(F.col("mode") == "r").select("query_id", "term").withColumn("__has_r", F.lit(1))
    qt = qt.join(r_terms, ["query_id", "term"], "left")

    # per-query clause cardinalities (computed after dropping missing contains)
    clause = qt.groupBy("query_id").agg(
        F.sum(F.when(F.col("mode") == "r", 1).otherwise(0)).alias("n_req"),
        F.sum(F.when(F.col("mode") == "c", 1).otherwise(0)).alias("n_con"),
        F.sum(F.when((F.col("mode") == "e") & F.col("df").isNotNull(), 1).otherwise(0)).alias("n_exc"),
    )

    posts = decoded_postings(spark, index_dir, terms=all_terms)
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    hits = posts.join(F.broadcast(qt.select("query_id", "term", "mode", "df", "__has_r")), "term")

    dl = doclens_table(spark, index_dir)
    hits = hits.join(dl, "doc_id")
    w = F.col("tf") * (k1 + 1) / (F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.lit(float(avgdl))))
    scores_once = (F.col("mode") == "r") | ((F.col("mode") == "c") & F.col("__has_r").isNull())
    hits = hits.withColumn("partial", F.when(scores_once, idf * w).otherwise(F.lit(0.0)))

    per_doc = hits.groupBy("query_id", "doc_id").agg(
        F.countDistinct(F.when(F.col("mode") == "r", F.col("term"))).alias("req_hit"),
        F.max((F.col("mode") == "c").cast("int")).alias("con_hit"),
        F.max((F.col("mode") == "e").cast("int")).alias("exc_hit"),
        F.sum("partial").alias("score"),
    )

    matched = (
        per_doc.join(F.broadcast(clause), "query_id")
        .filter(
            (
                # normal path: all requires hit, a contain hit if any exist, no exclude hit
                (F.col("req_hit") == F.col("n_req"))
                & ((F.col("n_con") == 0) | (F.col("con_hit") == 1))
                & (F.col("exc_hit") == 0)
                & ((F.col("n_req") + F.col("n_con")) > 0)
            )
            | (
                # exclude-only quirk: the excluded union becomes the result
                (F.col("n_req") == 0) & (F.col("n_con") == 0) & (F.col("exc_hit") == 1)
            )
        )
    )

    order = (F.col("score").desc(), F.col("doc_id").asc()) if scored else (F.col("doc_id").asc(),)
    win = Window.partitionBy("query_id").orderBy(*order)
    return (
        matched.withColumn("rank", F.row_number().over(win) - 1)
        .filter(F.col("rank") < k)
        .select("query_id", "rank", "doc_id", F.round(F.col("score"), 6).alias("score"))
    )


def batch_phrase_search(engine, phrases: DataFrame,
                        phrase_col: str = "phrase") -> DataFrame:
    """A whole TABLE of exact-phrase queries against the positional sidecar
    as ONE DataFrame plan — the batch twin of
    `functions.textsearch.index_phrase_search_positions` (the reference
    serves one query per HTTP request, wasm/index.c:76-104; a training-data
    pipeline asks "which of these 10^6 phrases appear where" and must join
    them against the index once).

    phrases: (query_id string, phrase string) — any size; the plan never
    collects it. Returns (query_id, doc_id), one row per phrase query per
    matching live doc. Phrases that tokenize to nothing, or whose terms are
    absent, produce no rows.

    Plan shape (scale notes):
      * distinct query vocabulary joins the positions scan broadcast-side —
        postings/positions never shuffle, and with many queries the vocab
        union approaches the dictionary anyway so semi-join beats isin;
      * per-(term, slot) rows broadcast against the decoded positions —
        map-side, no shuffle;
      * ONE shuffle total: groupBy (query_id, doc_id) collects (slot,
        positions) structs; adjacency is a JVM higher-order exists/forall
        chain with per-level variable names (p/i/s — pyspark derives HOF
        variable names from Python signatures; identical names would
        shadow), handling shard-split position arrays via per-slot
        array_contains over every struct of that slot.
    """
    from ..tokenizer import _tokens_col

    spark = engine.spark
    toks = phrases.select(
        "query_id", _tokens_col(phrase_col).alias("__ts"))
    qterms = toks.select(
        "query_id", F.posexplode("__ts").alias("slot", "term"))
    qlen = toks.select("query_id", F.size("__ts").alias("n")).filter(F.col("n") > 0)

    vocab = qterms.select("term").distinct()
    pt = engine.positions_df()
    if pt is None:
        raise ValueError("index has no positional sidecar (IndexConfig.positions)")
    from ..sources.postings import POS_DECODED_SCHEMA, _decode_pos_rows

    pruned = (pt.join(F.broadcast(vocab), "term")
              .select("term", "salt", "df", "payload")
              # spread hot terms' salt shards across decode tasks (the
              # range-sorted layout packs a term's shards into one scan
              # task otherwise — see SearchEngine._decoded_for)
              .repartition(F.col("term"), F.col("salt")).drop("salt"))
    decoded = pruned.mapInPandas(_decode_pos_rows, schema=POS_DECODED_SCHEMA)

    hits = decoded.join(F.broadcast(qterms), "term")
    sl = hits.groupBy("query_id", "doc_id").agg(
        F.collect_list(F.struct("slot", "positions")).alias("sl"))
    sl = sl.join(F.broadcast(qlen), "query_id")

    head = F.flatten(F.transform(
        F.filter(F.col("sl"), lambda s: s["slot"] == 0),
        lambda s: s["positions"]))
    chain = F.exists(head, lambda p: F.forall(
        F.sequence(F.lit(1), F.col("n") - 1),
        lambda i: F.exists(
            F.col("sl"),
            lambda s: (s["slot"] == i.cast("int"))
            & F.array_contains(s["positions"], p + i))))
    cond = F.when(F.col("n") == 1, F.size(head) > 0).otherwise(chain)
    return engine._live_filter_df(
        sl.filter(cond).select("query_id", "doc_id"))
