"""Source-code-aware text operators — the payload here is CODE (north rule:
an index over source-code repositories), and code has structure plain
word-splitting destroys: identifiers pack several words into one token
(`getUserName`, `parse_json_block`, `HTTPServer2`).

`identifier_subtokens_col` splits identifiers the way code-search engines
index them (camelCase / PascalCase / snake_case / kebab-case / digit
boundaries, acronym runs kept whole: "HTTPServer" → http, server), entirely
in JVM expressions (regexp_replace boundary markers → split → lower) — no
UDF, whole-stage codegen, oracle-able in any SQL engine with regexes.

Reference analogue: edgesearch tokenizes on non-alphanumerics only
(src/build/mod.rs word splitting); sub-identifier indexing is the
beyond-reference step a code corpus needs so `username` finds
`getUserName`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# boundary rules, applied as sequential regexp_replace markers before one
# split. CONSUME-style two-group patterns (no lookahead) so the exact same
# rules run in RE2-based engines (DuckDB oracle) with identical results —
# consuming the right-hand group only shifts where the NEXT scan resumes,
# and sequential passes re-find any boundary a previous pass stepped over:
#  1. acronym→word:  HTTPServer → HTTP|Server   ([A-Z]+)([A-Z][a-z])
#  2. lower→Upper:   getUser    → get|User      ([a-z0-9])([A-Z])
#  3. letter→digit:  utf8       → utf|8         ([a-zA-Z])([0-9])
#  4. digit→letter:  8bit       → 8|bit         ([0-9])([a-zA-Z])
_BOUNDARIES = (
    r"([A-Z]+)([A-Z][a-z])",
    r"([a-z0-9])([A-Z])",
    r"([a-zA-Z])([0-9])",
    r"([0-9])([a-zA-Z])",
)


def identifier_marked_col(content_col: str) -> Column:
    """``content_col`` with a ``$`` marker inserted at every identifier
    boundary — the pre-tokenization transform (``$`` is a token separator
    for every tokenizer impl, so downstream split/lower yields subtokens).
    This is what ``IndexConfig(split_identifiers=True)`` feeds the build's
    tokenize stages while the docs store keeps the ORIGINAL content."""
    c = content_col if isinstance(content_col, Column) else F.col(content_col)
    for pat in _BOUNDARIES:
        c = F.regexp_replace(c, pat, r"$1\$$2")  # '$' never survives the split
    return c


def identifier_subtokens_col(content_col: str) -> Column:
    """array<string> of lowercased identifier subtokens of ``content_col``
    (empty strings dropped; original multi-word identifiers disappear —
    callers union this with the plain token stream when both granularities
    should be indexed)."""
    toks = F.split(F.lower(identifier_marked_col(content_col)), r"[^a-zA-Z0-9]+")
    return F.filter(toks, lambda t: t != "")


def code_token_stats(docs: DataFrame, id_col: str = "doc_id",
                     content_col: str = "content") -> DataFrame:
    """Per-doc identifier-granularity stats: subtoken count, distinct
    subtoken count, and the share of subtokens that are pure digits —
    the code-corpus quality signals (generated/minified files show extreme
    digit shares and tiny distinct/total ratios)."""
    ts = identifier_subtokens_col(content_col)
    return docs.select(
        F.col(id_col),
        F.size(ts).alias("n_subtokens"),
        F.size(F.array_distinct(ts)).alias("n_distinct"),
        F.size(F.filter(ts, lambda t: t.rlike("^[0-9]+$"))).alias("n_numeric"),
    )
