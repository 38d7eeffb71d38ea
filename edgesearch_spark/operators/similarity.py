"""Similarity search over embedding columns (array<float>).

``cosine_topk`` is the exactness baseline (brute force, fully distributed:
one narrow pass computing dot products + a top-k). ``lsh_bucket_histogram``
and ``ann_lsh_topk`` are the scale path: deterministic hyperplane LSH
restricts the scan to matching buckets, turning 100 TB of vectors into a
bucket-pruned scan (bucket column is a partition/cluster key at write time).

All arithmetic via JVM higher-order functions (zip_with/aggregate) in
double precision — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_with_lit(vec_col: F.Column, qvec: list[float]) -> F.Column:
    lit_vec = F.array(*[F.lit(float(x)) for x in qvec])
    vd = F.transform(vec_col, lambda x: x.cast("double"))
    return F.aggregate(F.zip_with(vd, lit_vec, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)


def _norm(vec_col: F.Column) -> F.Column:
    vd = F.transform(vec_col, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(F.zip_with(vd, vd, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.
    (vec_id, cos_sim rounded 4dp), ties broken by vec_id asc."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in qvec))
    df = emb
    if exclude_ids:
        df = df.filter(~F.col(id_col).isin(exclude_ids))
    cos = _dot_with_lit(F.col(vec_col), qvec) / (_norm(F.col(vec_col)) * F.lit(qnorm))
    return (
        df.select(F.col(id_col), F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def _mix32(a: int, b: int, seed: int) -> int:
    x = (a * 2654435761 + b * 40503 + seed * 2246822519) & 0xFFFFFFFF
    x ^= x >> 15
    x = (x * 2246822519) & 0xFFFFFFFF
    x ^= x >> 13
    return x


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim (counter-based
    arithmetic hash — reproducible across runs/partitions, no RNG state)."""
    return [
        [(_mix32(p, i, seed) % 2001 - 1000) / 1000.0 for i in range(dim)]
        for p in range(n_planes)
    ]


def lsh_bucket_col(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """Bucket id = sign-bit signature of dot products with each plane."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        bit = (_dot_with_lit(vec_col, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def lsh_bucket_histogram(
    emb: DataFrame, n_planes: int = 8, seed: int = 42, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """(bucket, n_vecs) histogram — the data layout an IVF/LSH index writes;
    also a skew diagnostic for the bucketed join."""
    dim = dim or len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    return (
        emb.select(lsh_bucket_col(F.col(vec_col), planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


def embedding_near_dup_exact(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (a < b, cos ≥ threshold) via a
    self-join — the small-scale oracle for the LSH variant (O(n²): use only
    for verification / small dims of the pipeline)."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.zip_with(vd, vd, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x))
    base = emb.select(F.col(id_col).alias("id"), vd.alias("v"), norm.alias("n"))
    a, b = base.alias("a"), base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cos = dot / (F.col("a.n") * F.col("b.n"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"), F.round(cos, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Scale path: candidates from equi-joins on hyperplane-LSH buckets —
    ``n_bands`` independent plane sets OR-amplify recall (a true near-dup
    pair is missed only if split in EVERY band: miss ≈ (1-(1-θ/π)^planes)^bands),
    exact cosine filter on candidates only — never a cross join."""
    dim = dim or len(emb.select(vec_col).first()[0])
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.zip_with(vd, vd, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x))
    bucket_cols = [
        lsh_bucket_col(F.col(vec_col), hyperplanes(dim, n_planes, seed + 1000 * band)).alias(f"bkt{band}")
        for band in range(n_bands)
    ]
    base = emb.select(F.col(id_col).alias("id"), vd.alias("v"), norm.alias("n"), *bucket_cols)
    # explode to (band, bucket) so one equi-join serves all bands
    banded = base.select(
        "id", "v", "n",
        F.explode(F.array(*[F.struct(F.lit(i).alias("band"), F.col(f"bkt{i}").alias("bucket")) for i in range(n_bands)])).alias("bb"),
    ).select("id", "v", "n", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cos = dot / (F.col("a.n") * F.col("b.n"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"), F.round(cos, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def ann_lsh_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket matches the
    query's bucket or any bucket within ``multiprobe_bits`` bit flips
    (multi-probe LSH). At scale the bucket filter prunes partitions."""
    planes = hyperplanes(len(qvec), n_planes, seed)
    qbits = 0
    for p, plane in enumerate(planes):
        dot = sum(float(a) * float(b) for a, b in zip(qvec, plane))
        qbits |= (1 if dot > 0 else 0) << p
    probe = {qbits}
    if multiprobe_bits >= 1:
        probe |= {qbits ^ (1 << p) for p in range(n_planes)}
    bucketed = emb.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("bucket").isin([int(x) for x in probe]))
    return cosine_topk(cand, qvec, k=k, id_col=id_col, vec_col=vec_col)


def ivf_centroids(dim: int, n_centroids: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random centroids in [-1, 1]^dim (same counter-
    based arithmetic as ``hyperplanes`` — reproducible everywhere, no RNG
    state; at production scale these would come from a k-means pass, the
    assignment/probe plans below are identical either way)."""
    return [
        [(_mix32(c + 7919, i, seed) % 2001 - 1000) / 1000.0 for i in range(dim)]
        for c in range(n_centroids)
    ]


def _cos_with_lit(vec_col: F.Column, centroid: list[float]) -> F.Column:
    import math

    cn = math.sqrt(sum(x * x for x in centroid)) or 1.0
    return _dot_with_lit(vec_col, centroid) / (_norm(vec_col) * F.lit(cn))


def ivf_cell_col(vec_col: F.Column, centroids: list[list[float]]) -> F.Column:
    """IVF cell id = argmax-cosine centroid (first max wins on ties) — the
    coarse quantizer of an IVF index, as one JVM expression."""
    cos = F.array(*[_cos_with_lit(vec_col, c) for c in centroids])
    return (F.array_position(cos, F.array_max(cos)) - 1).cast("long")


def ivf_cells(
    emb: DataFrame, n_centroids: int = 16, seed: int = 7,
    vec_col: str = "embedding", dim: int | None = None,
) -> DataFrame:
    """(cell, n_vecs) histogram — the partition layout an IVF index writes
    (cell is the partition/cluster key at write time; a probe scans only its
    cells' partitions). Fully oracle-checkable: centroids are deterministic."""
    dim = dim or len(emb.select(vec_col).first()[0])
    cents = ivf_centroids(dim, n_centroids, seed)
    return (
        emb.select(ivf_cell_col(F.col(vec_col), cents).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )


def ann_ivf_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """IVF search: rank centroids by cosine to the query, scan only the
    ``nprobe`` closest cells, brute-force within them. At scale the cell
    column is a partition key, so the scan prunes to nprobe/n_centroids of
    the data; recall grows with nprobe (nprobe = n_centroids ⇒ exact)."""
    import math

    dim = dim or len(qvec)
    cents = ivf_centroids(dim, n_centroids, seed)
    qn = math.sqrt(sum(float(x) ** 2 for x in qvec)) or 1.0

    def qcos(c: list[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(float(a) * b for a, b in zip(qvec, c)) / (qn * cn)

    probe = sorted(range(n_centroids), key=lambda c: -qcos(cents[c]))[: max(1, nprobe)]
    cells = emb.withColumn("cell", ivf_cell_col(F.col(vec_col), cents))
    cand = cells.filter(F.col("cell").isin([int(c) for c in probe]))
    return cosine_topk(cand, qvec, k=k, id_col=id_col, vec_col=vec_col)
