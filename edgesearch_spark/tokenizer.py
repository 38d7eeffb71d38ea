"""Tokenization / normalization.

The reference engine never tokenizes — terms arrive pre-tokenized
(reference: README.md:99 "terms do not necessarily have to be words from the
document"); the convention comes from its demo pipelines
(demo/jobs/data/get-data.js:28-32, demo/work-at-microsoft/data/build.ts:31-50,
demo/wiki/data/processor/src/main.rs:23,63): split on non-alphanumerics,
drop empties, lowercase, optional `{field}_` prefix, optional word-map
normalization, per-doc dedupe.

Two implementations:

* ``tokenize_pairs`` — pure Spark built-ins (split/explode/groupBy): stays
  inside WholeStageCodegen on the JVM, zero Python in the hot path. This is
  the default build path.
* ``tokenize_pairs_pandas`` — Arrow-vectorized pandas UDF (mapInPandas):
  same output, demonstrates the vectorized-UDF path and hosts the word-map
  normalization. Used when a custom normalizer is supplied.

Both emit one row per (doc_id, term) with the in-doc term frequency ``tf``
and the document length ``dl`` (total token count) — tf/dl feed BM25; the
reference's boolean semantics only need the distinct terms.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^a-zA-Z0-9]+"  # demo convention (get-data.js:28, main.rs:23)
MAX_TERM_BYTES = 255  # reference serializes term length as u8 (src/build/chunks/mod.rs:50)

PAIRS_SCHEMA = "doc_id long, term string, tf long, dl long"


def _tokens_col(content_col) -> F.Column:
    c = content_col if isinstance(content_col, F.Column) else F.col(content_col)
    toks = F.split(F.lower(c), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: (t != F.lit("")) & (F.octet_length(t) <= MAX_TERM_BYTES))


def norm_tokens_col(
    content_col,
    word_map: dict[str, str] | None = None,
    field_prefix: str | None = None,
) -> F.Column:
    """The token array WITH the demo-convention normalizations applied —
    pure JVM (create_map lookup + transform), so position-aware consumers
    (the positional sidecar) see the same normalized stream the pandas /
    Arrow tokenizers index, in kept-token order. word_map rewrites happen
    per token (position-preserving); field_prefix prepends `{field}_`."""
    ts = _tokens_col(content_col)
    if word_map:
        m = F.create_map(*[F.lit(x) for kv in word_map.items() for x in kv])
        ts = F.transform(ts, lambda t: F.coalesce(m[t], t))
    if field_prefix:
        ts = F.transform(ts, lambda t: F.concat(F.lit(f"{field_prefix}_"), t))
    return ts


def doc_length_col(content_col: str) -> F.Column:
    """Token count per document (BM25 dl) as a single regexp_count — ~40×
    faster than size(filter(split(…))), whose higher-order filter lambda
    falls out of whole-stage codegen. The lookarounds make an alnum run
    longer than MAX_TERM_BYTES count as zero tokens (matching the
    tokenizer's drop-overlong rule) instead of splitting into two matches."""
    pat = rf"(?<![a-zA-Z0-9])[a-zA-Z0-9]{{1,{MAX_TERM_BYTES}}}(?![a-zA-Z0-9])"
    return F.regexp_count(F.col(content_col), F.lit(pat)).cast("long")


def tokenize_pairs(df: DataFrame, doc_id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """(doc_id, content) → (doc_id, term, tf, dl). All JVM built-ins.

    dl is attached per row (denormalized) so BM25 weights can be computed
    without a second join against a doc-length table.
    """
    toks = df.select(F.col(doc_id_col).alias("doc_id"), _tokens_col(content_col).alias("toks"))
    exploded = toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
    return exploded.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf")).select(
        "doc_id", "term", "tf", "dl"
    )


def doc_terms(df: DataFrame, doc_id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """Per-doc distinct term set (the reference's document-terms contract:
    unique within doc — src/build/mod.rs:64-67). (doc_id, terms array<string>)."""
    return df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.array_distinct(_tokens_col(content_col)).alias("terms"),
    )


def tokenize_pairs_pandas(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    word_map: dict[str, str] | None = None,
    field_prefix: str | None = None,
) -> DataFrame:
    """Arrow-vectorized variant with demo-convention normalization hooks:
    word_map (build.ts:14-29 `ms→microsoft` style) and `{field}_` term
    prefixing (build.ts:50). No per-row Python — pandas str ops + explode."""
    import re

    pat = re.compile(r"[a-zA-Z0-9]+")  # findall of runs ≡ split-and-drop-empties
    wmap = dict(word_map or {})
    prefix = f"{field_prefix}_" if field_prefix else ""

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # All C-path ops (north rule: no per-row python). A string
            # groupby over millions of exploded tokens dominated profiles;
            # factorize → composite int key → np.unique is ~5-10× cheaper.
            # fillna: a null content cell tokenizes to zero terms (matches
            # the arrow path's `if c else []`), instead of poisoning str.len
            toks = pdf[content_col].fillna("").str.lower().str.findall(pat)
            lens = toks.str.len().to_numpy(np.int64)
            doc_rep = np.repeat(pdf[doc_id_col].to_numpy(np.int64), lens)
            if doc_rep.size == 0:
                continue
            flat = np.concatenate([np.asarray(x, dtype=object) for x in toks.to_numpy()])
            codes, uniques = pd.factorize(flat, sort=False)
            # drop overlong terms by unique-level mask (rare; avoids per-token len())
            ulen = uniques.str.len().to_numpy() if hasattr(uniques, "str") else np.fromiter((len(u) for u in uniques), np.int64, count=len(uniques))
            bad = np.flatnonzero(ulen > MAX_TERM_BYTES)
            if bad.size:
                keep = ~np.isin(codes, bad)
                codes, doc_rep = codes[keep], doc_rep[keep]
            uarr = np.asarray(uniques, dtype=object)
            if wmap or prefix:
                # normalize at the UNIQUE level, then re-factorize so terms
                # merged by the word map (ms→microsoft + literal microsoft)
                # combine their counts like a post-normalization groupby would
                s = pd.Series(uarr)
                if wmap:
                    s = s.map(lambda t: wmap.get(t, t))
                if prefix:
                    s = prefix + s
                recodes, uniques2 = pd.factorize(s, sort=False)
                codes = recodes[codes]
                uarr = np.asarray(uniques2, dtype=object)
            n_u = len(uarr)
            key = doc_rep * np.int64(n_u) + codes
            ukey, tf = np.unique(key, return_counts=True)
            doc_out = ukey // n_u
            term_out = uarr[ukey % n_u]
            # dl = Σ tf per doc; ukey is doc-sorted → segment-sum via reduceat
            heads = np.flatnonzero(np.concatenate([[True], doc_out[1:] != doc_out[:-1]]))
            dl_per_doc = np.add.reduceat(tf, heads)
            dl = np.repeat(dl_per_doc, np.diff(np.concatenate([heads, [doc_out.size]])))
            yield pd.DataFrame({"doc_id": doc_out, "term": term_out, "tf": tf, "dl": dl})

    return df.select(doc_id_col, content_col).mapInPandas(run, schema=PAIRS_SCHEMA)
