"""edgesearch_spark — a PySpark-native inverted-index builder + BM25 query engine.

Brand-new engine with the query/data-processing capabilities of
wilsonzlin/edgesearch (reference at /root/reference, studied in SURVEY.md),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, with
vectorized numpy/pandas-UDF kernels only where built-ins can't express the
semantics (posting-block codec, block-max WAND top-k).

Layout:
  codec.py       — delta+varint posting-block codec (vectorized numpy)
  tokenizer.py   — tokenize/normalize (JVM built-ins + pandas-UDF variant)
  docids.py      — scalable deterministic docID assignment (no single-partition window)
  build.py       — index build pipeline: salted two-phase postings, docs store,
                   term stats, checkpoint manifest + metrics, resumable
  engine.py      — query engine: boolean AND/OR/ANDNOT kernel with reference
                   semantics + quirks, rank-select pagination, BM25 top-k
  oracle.py      — independent brute-force oracle (pure python) for goldens
  corpus.py      — deterministic synthetic source-code corpus generator
  operators/     — dedup (exact/minhash/simhash/jaccard), similarity (ANN),
                   multimodal stubs
  functions/     — text analysis (langid, quality, token stats, fingerprint)
"""

__version__ = "0.3.1"  # 0.3.1: stats has_overlong_runs + bigram sidecar; 0.3: per-block max_tf; 0.2.1: bloom sidecar; 0.2: adaptive containers
