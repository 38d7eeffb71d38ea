"""Deterministic synthetic source-code corpus (FIXTURES.md F1 shape).

Generates the BASELINE.json input_hint table
``(repo, path, commit, lang, content)`` at any size, distributed via
``spark.range(n).mapInPandas`` with *counter-based arithmetic hashing* —
every cell is a pure function of the row index and the seed, so the corpus
is byte-identical at any parallelism / partitioning (needed for the
two-parallelism scaling benchmark and for docID-determinism tests).

Term distribution is engineered for the skew the north rule targets:
  * hot keywords per language (`import`, `def`, `public`, …) + corpus-wide
    hots (`license`, `copyright`, `the`) — zipf-weighted, df ≈ N;
  * mid-frequency identifiers (`util123`, `helper42`) — thousands of docs;
  * one unique identifier per doc (`uid<hex>`) — guaranteed singleton terms.

No RNG objects: token choice = searchsorted over a zipf CDF of a 32-bit
mix of (doc_index, position, seed). Vectorized numpy throughout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "java", "rust", "ts", "go", "c"]
EXT = {"python": "py", "java": "java", "rust": "rs", "ts": "ts", "go": "go", "c": "c"}

_KEYWORDS = {
    "python": ["import", "def", "return", "self", "class", "none", "for", "in", "if", "else"],
    "java": ["public", "class", "void", "static", "import", "return", "new", "final", "int", "string"],
    "rust": ["fn", "let", "mut", "pub", "use", "impl", "match", "struct", "mod", "crate"],
    "ts": ["const", "function", "return", "export", "import", "let", "interface", "type", "async", "await"],
    "go": ["func", "package", "import", "return", "var", "type", "struct", "interface", "defer", "go"],
    "c": ["include", "int", "void", "return", "static", "struct", "char", "const", "sizeof", "define"],
}
_COMMON = ["license", "copyright", "the", "value", "data", "result", "error", "test", "main", "utils"]
_MID = [f"util{k}" for k in range(200)] + [f"helper{k}" for k in range(100)]

_SEPS = np.array([" ", " ", " ", "(", ".", ", ", "\n", " = "], dtype=object)


def _mix(a: np.ndarray, b: np.ndarray, seed: int) -> np.ndarray:
    """32-bit multiplicative mix — deterministic pseudo-random uint32."""
    x = (a.astype(np.uint64) * np.uint64(2654435761) + b.astype(np.uint64) * np.uint64(40503) + np.uint64(seed * 2246822519)) & np.uint64(0xFFFFFFFF)
    x ^= x >> np.uint64(15)
    x = (x * np.uint64(2246822519)) & np.uint64(0xFFFFFFFF)
    x ^= x >> np.uint64(13)
    return x


def _zipf_cdf(n: int, s: float = 1.07) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return np.cumsum(w) / w.sum()


def _gen_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    langs = [LANGS[int(i) % len(LANGS)] for i in ids]
    # per-doc token count: 20..219
    dl = 20 + (_mix(ids, np.zeros_like(ids), seed) % np.uint64(200)).astype(np.int64)
    vocab_by_lang = {lg: np.array(_KEYWORDS[lg] + _COMMON + _MID, dtype=object) for lg in LANGS}
    cdf_by_lang = {lg: _zipf_cdf(len(vocab_by_lang[lg])) for lg in LANGS}
    contents = []
    for i, lg, n_tok in zip(ids, langs, dl):
        pos = np.arange(n_tok, dtype=np.uint64)
        h = _mix(np.full(n_tok, i, dtype=np.uint64), pos, seed)
        u = (h % np.uint64(1_000_000)).astype(np.float64) / 1_000_000.0
        idx = np.searchsorted(cdf_by_lang[lg], u)
        toks = vocab_by_lang[lg][np.clip(idx, 0, len(vocab_by_lang[lg]) - 1)]
        seps = _SEPS[(_mix(pos, np.full(n_tok, i, dtype=np.uint64), seed + 1) % np.uint64(len(_SEPS))).astype(np.int64)]
        body = "".join(t + s for t, s in zip(toks.tolist(), seps.tolist()))
        contents.append(f"{body} uid{int(i):08x}")
    commit = [(f"{int(_mix(np.array([i], dtype=np.uint64), np.array([7], dtype=np.uint64), seed)[0]):08x}" * 5) for i in ids]
    return pd.DataFrame(
        {
            "repo": [f"org_{int(i) % 89:03d}/repo_{(int(i) // 89) % 23:02d}" for i in ids],
            "path": [f"src/m{(int(i) // 13) % 40:02d}/f_{int(i):09d}.{EXT[lg]}" for i, lg in zip(ids, langs)],
            "commit": commit,
            "lang": langs,
            "content": contents,
        }
    )


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def generate_corpus(spark: SparkSession, n_docs: int, seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    n_part = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(dtype=np.uint64), seed)

    return spark.range(0, n_docs, numPartitions=n_part).mapInPandas(gen, schema=CORPUS_SCHEMA)


def generate_corpus_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side twin of generate_corpus for oracle construction in tests."""
    return _gen_batch(np.arange(n_docs, dtype=np.uint64), seed)
