"""Text analysis functions for training-data pipelines — all JVM built-ins.

Each function's formula is mirrored exactly by a DuckDB oracle SQL in
plans/contract.py; keep the two in lockstep when editing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenizer import _tokens_col

EN_STOP = ["the", "a", "of", "and"]
ES_STOP = ["el", "la", "de", "y"]
FR_STOP = ["le", "la", "et", "un"]


def _hits(ts: F.Column, words: list[str]) -> F.Column:
    return F.size(F.filter(ts, lambda t: t.isin(words)))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """N-gram/stopword-heuristic language ID: argmax of per-language stopword
    hits with fixed priority en ≥ es ≥ fr; no hits → 'unknown'."""
    ts = _tokens_col(text_col)
    en, es, fr = _hits(ts, EN_STOP), _hits(ts, ES_STOP), _hits(ts, FR_STOP)
    pred = (
        F.when((en >= es) & (en >= fr) & (en > 0), "en")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )
    return df.select(F.col(id_col).alias("doc_id"), pred.alias("pred_lang"))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(n_tokens, stop_ratio, quality): length/stopword-ratio quality signal
    used for corpus filtering. quality = n_tokens * (1 - stop_ratio)."""
    ts = _tokens_col(text_col)
    n = F.size(ts)
    ratio = _hits(ts, EN_STOP) / F.greatest(n, F.lit(1))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(ratio, 4).alias("stop_ratio"),
        F.round(n * (1 - ratio), 4).alias("quality"),
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace vs alphanumeric token counts + char length."""
    ws = F.size(F.filter(F.split(F.col(text_col), " +"), lambda t: t != F.lit("")))
    alnum = F.size(_tokens_col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        alnum.cast("long").alias("alnum_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def fingerprint_md5(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (rolling-hash fingerprinting's cheap cousin; stable across formatting)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "))
    return df.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fp"))


# GPT-2-style pretokenizer, ASCII-simplified so Java regex (Spark) and RE2
# (DuckDB) agree byte-for-byte: a token is an optionally space-prefixed
# letter run, digit run, or punctuation run, or a whitespace run.
BPE_ISH_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n]+|[ \t\n]+"


def bpe_ish_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Subword-style token counting (the training-data costing signal):
    counts matches of a BPE-pretokenizer-shaped regex and the ratio to
    whitespace tokens (≈ subword fan-out). Pure JVM regexp_count."""
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast("long")
    ws = F.size(F.filter(F.split(F.col(text_col), " +"), lambda t: t != F.lit(""))).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        bpe.alias("bpe_tokens"),
        ws.alias("ws_tokens"),
        F.round(bpe / F.greatest(ws, F.lit(1)), 4).alias("fanout"),
    )
