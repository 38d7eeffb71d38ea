"""Dedup / similarity / text-analysis operator tests on the driver tables
(sf0.001: 500 docs, 500 embeddings — small enough for exact oracles)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_minhash_lsh_recall(spark, docs):
    """LSH candidates must cover the high-Jaccard pairs (recall on the
    planted near-dups); precision is allowed to be < 1 by construction."""
    from edgesearch_spark.operators.dedup import minhash_lsh_candidates, shingle_jaccard_pairs

    true_pairs = {
        (r["a"], r["b"])
        for r in shingle_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()
    }
    cands = {
        (r["a"], r["b"])
        for r in minhash_lsh_candidates(docs, "doc_id", "text", n=3, num_hashes=32, band_size=4).collect()
    }
    assert true_pairs, "fixture should contain planted near-dups"
    missed = true_pairs - cands
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"
    # production xxhash64 family: same recall guarantee, no crypto hashing
    xx = {
        (r["a"], r["b"])
        for r in minhash_lsh_candidates(docs, "doc_id", "text", n=3, num_hashes=32,
                                        band_size=4, family="xx").collect()
    }
    assert not (true_pairs - xx), f"xx-family LSH missed pairs: {true_pairs - xx}"


def test_simhash_near_dups_close(spark, docs):
    """Near-dup docs (shingle jaccard ≥ 0.8) must be hamming-close in
    simhash space; random pairs must not be."""
    from edgesearch_spark.operators.dedup import shingle_jaccard_pairs, simhash

    sims = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    pairs = shingle_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    near = [ham(sims[r["a"]], sims[r["b"]]) for r in pairs]
    assert near and max(near) <= 12, near
    ids = sorted(sims)
    far = [ham(sims[ids[i]], sims[ids[i + 250]]) for i in range(0, 200, 20)]
    assert np.mean(far) > 15, far


def test_ann_brute_force_matches_numpy(spark, emb):
    from edgesearch_spark.operators.similarity import cosine_topk

    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = mat[pdf["vec_id"].tolist().index(0)]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    pdf["cos"] = cos
    want = (
        pdf[pdf["vec_id"] != 0]
        .sort_values(["cos", "vec_id"], ascending=[False, True])
        .head(10)["vec_id"]
        .tolist()
    )
    got = [r["vec_id"] for r in cosine_topk(emb, [float(x) for x in q], k=10, exclude_ids=[0]).collect()]
    assert got == want


def test_ann_lsh_topk_subset_of_bruteforce_space(spark, emb):
    """LSH top-k returns valid cosine scores from the probed buckets and the
    top-1 from multi-probe should usually equal the exact top-1 at this scale."""
    from edgesearch_spark.operators.similarity import ann_lsh_topk, cosine_topk

    pdf = emb.filter(F.col("vec_id") == 0).collect()[0]
    q = [float(x) for x in pdf["embedding"]]
    approx = ann_lsh_topk(emb.filter(F.col("vec_id") != 0), q, k=5, n_planes=8, multiprobe_bits=1).collect()
    assert 1 <= len(approx) <= 5
    exact = cosine_topk(emb, q, k=50, exclude_ids=[0]).collect()
    exact_ids = {r["vec_id"] for r in exact}
    assert any(r["vec_id"] in exact_ids for r in approx)


def test_multimodal_plumbing(spark, docs):
    from edgesearch_spark.operators.multimodal import extract_meta, frame_sample, image_features

    payloads = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")).limit(20)
    meta = extract_meta(payloads, "doc_id", "payload").collect()
    assert len(meta) == 20 and all(r["feature"] == r["n_bytes"] % 251 for r in meta)
    feats = image_features(payloads, "doc_id", "payload", fake=True).collect()
    assert len(feats) == 20 and all(r["channels"] == 3 for r in feats)
    frames = frame_sample(payloads, "doc_id", "payload", every_n_bytes=64).collect()
    assert len(frames) >= 20 and all(len(r["frame_bytes"]) <= 64 for r in frames)

    from edgesearch_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert rows[0]["rank"] == 0
    assert [f.name for f in df.schema.fields] == ["rank", "doc_id", "score", "lang", "source"]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_embedding_near_dup_lsh_recall(spark, emb):
    """Banded LSH must recover planted near-dup pairs (cos ≥ 0.99); all its
    pairs pass the exact-cosine filter so it is a subset of the exact join."""
    import pandas as pd

    from edgesearch_spark.operators.similarity import (
        embedding_near_dup_exact,
        embedding_near_dup_lsh,
    )

    # plant near-dups: 30 base vectors + tiny deterministic perturbations
    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 64))
    noisy = base + rng.normal(size=(30, 64)) * 0.02
    others = rng.normal(size=(140, 64))
    mat = np.concatenate([base, noisy, others]).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(len(mat)), "embedding": [list(map(float, v)) for v in mat]})
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")

    exact = {(r["a"], r["b"]) for r in embedding_near_dup_exact(df, 0.99).collect()}
    lsh = {(r["a"], r["b"]) for r in embedding_near_dup_lsh(df, 0.99, n_planes=6, n_bands=4).collect()}
    planted = {(i, i + 30) for i in range(30)}
    assert planted <= exact
    assert lsh <= exact
    missed = planted - lsh
    assert len(missed) <= 1, missed  # OR-amplified recall ≈ 100% at cos≥0.99


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    """nprobe = n_centroids scans every cell ⇒ identical to exact top-k."""
    from pyspark.sql import functions as F

    from edgesearch_spark.operators.similarity import ann_ivf_topk, cosine_topk

    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    base = emb.filter(F.col("vec_id") != 0)
    exact = [(r["vec_id"], r["cos_sim"]) for r in cosine_topk(base, q, k=8).collect()]
    full = [(r["vec_id"], r["cos_sim"]) for r in
            ann_ivf_topk(base, q, k=8, n_centroids=8, nprobe=8).collect()]
    assert full == exact


def test_ivf_probe_recall_on_planted_neighbors(spark, emb):
    """Vectors nearly identical to the query land in the query's cell, so
    even nprobe=1 finds planted near-duplicates."""
    import numpy as np
    from pyspark.sql import functions as F

    from edgesearch_spark.operators.similarity import ann_ivf_topk

    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    planted = [(10_000 + i, [float(v) + 0.001 * i for v in q]) for i in range(3)]
    df = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>"))
    got = {r["vec_id"] for r in ann_ivf_topk(df, q, k=3, n_centroids=8, nprobe=1).collect()}
    assert got == {10_000, 10_001, 10_002}


def test_bpe_ish_tokens_shapes(spark, docs):
    from edgesearch_spark.functions.textstats import bpe_ish_tokens

    rows = bpe_ish_tokens(docs, "doc_id", "text").collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r["bpe_tokens"] >= r["ws_tokens"] >= 0  # subwords never fewer than words
        assert r["fanout"] >= 1.0 or r["ws_tokens"] == 0


def _make_ppm(w, h, val):
    import numpy as np
    px = np.full((h, w, 3), val, np.uint8)
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + px.tobytes()


def _make_bmp(w, h, val):
    import numpy as np
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = val
    header = (b"BM" + (54 + stride * h).to_bytes(4, "little") + b"\0\0\0\0" + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little") + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
              + bytes(20))
    return header + rows.tobytes()


def _make_wav(n, rate=8000, channels=1, amp=1000):
    import numpy as np
    data = (np.ones(n * channels, np.int16) * amp).tobytes()
    fmt = ((1).to_bytes(2, "little") + channels.to_bytes(2, "little") + rate.to_bytes(4, "little")
           + (rate * channels * 2).to_bytes(4, "little") + (channels * 2).to_bytes(2, "little")
           + (16).to_bytes(2, "little"))
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_real_image_decode_ppm_bmp(spark):
    from edgesearch_spark.operators.multimodal import image_features, resize_nearest, decode_image

    rows = [(1, bytearray(_make_ppm(7, 5, 100))), (2, bytearray(_make_bmp(6, 4, 30)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in image_features(df, "doc_id", "payload").collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["mean_pixel"]) == (7, 5, 100.0)
    assert (got[2]["width"], got[2]["height"], got[2]["mean_pixel"]) == (6, 4, 30.0)
    small = resize_nearest(decode_image(_make_ppm(8, 8, 9)), 2, 4)
    assert small.shape == (2, 4, 3) and (small == 9).all()


def test_real_audio_decode_wav(spark):
    from edgesearch_spark.operators.multimodal import audio_features

    rows = [(1, bytearray(_make_wav(500, rate=16000, channels=2, amp=2000)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    r = audio_features(df, "doc_id", "payload").collect()[0]
    assert (r["n_samples"], r["sample_rate"], r["channels"]) == (500, 16000, 2)
    assert abs(r["rms"] - 2000.0) < 1e-9


def test_real_frame_sampling_ppm_stream(spark):
    from edgesearch_spark.operators.multimodal import frame_sample_ppm, decode_image

    video = b"".join(_make_ppm(4, 3, v) for v in (10, 20, 30, 40, 50))
    df = spark.createDataFrame([(7, bytearray(video))], "doc_id long, payload binary")
    frames = sorted(frame_sample_ppm(df, "doc_id", "payload", every_n=2).collect(),
                    key=lambda r: r["frame_idx"])
    assert [f["frame_idx"] for f in frames] == [0, 2, 4]
    vals = [int(decode_image(bytes(f["frame_bytes"])).mean()) for f in frames]
    assert vals == [10, 30, 50]


def test_pipeline_example_end_to_end(spark, tmp_path_factory):
    """The documented pipeline composition (quality → exact dedup → LSH
    near-dup prune → index → WAND serve) runs end-to-end and each stage
    monotonically shrinks the corpus."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from pipeline_example import run_pipeline

    from edgesearch_spark.corpus import generate_corpus
    from edgesearch_spark.docids import assign_doc_ids

    corpus = assign_doc_ids(generate_corpus(spark, 400, seed=11), ("repo", "path", "commit"))
    out = str(tmp_path_factory.mktemp("pipe_idx"))
    stats = run_pipeline(spark, corpus, out)
    assert stats["input_docs"] == 400
    assert stats["input_docs"] >= stats["after_quality"] >= stats["after_exact_dedup"] >= stats["after_near_dedup"]
    assert stats["after_near_dedup"] > 0
    assert stats["query_total"] > 0 and stats["query_top"]


def _make_png(w=4, h=3) -> bytes:
    """Minimal valid 8-bit RGB PNG via stdlib only (zlib + crc32): a
    deterministic gradient — lets the PIL dispatch path be exercised
    wherever PIL exists, with no binary fixture committed."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    raw = b""
    for y in range(h):
        raw += b"\x00"  # filter type 0 per scanline
        for x in range(w):
            raw += bytes((x * 50 % 256, y * 80 % 256, (x + y) * 30 % 256))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_dispatch_with_or_without_pil():
    """Compressed-image dispatch (VERDICT r2 item 6): with PIL importable the
    tiny stdlib-built PNG decodes to the exact RGB gradient; without it the
    documented NotImplementedError fires. Either way the dispatch path runs."""
    from edgesearch_spark.operators.multimodal import decode_image

    png = _make_png()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            decode_image(png)
        return
    img = decode_image(png)
    assert img.shape == (3, 4, 3)
    assert tuple(img[0, 1]) == (50, 0, 30)
    assert tuple(img[2, 3]) == (150, 160, 150)


def test_connected_components_chain_and_star(spark):
    """Label propagation must converge past multi-hop chains (iteration
    count > 1) and keep singletons self-labeled."""
    from edgesearch_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),        # 5-node chain → cluster 1
         (10, 11), (10, 12), (10, 13),          # star → cluster 10
         (20, 21)],                              # pair → cluster 20
        "a long, b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 13, 20, 21, 99]],
                                  "doc_id long")
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20, 99: 99}, got


def test_connected_components_deep_chain_finishes_via_star(spark):
    """A chain deeper than max_iter must NOT return silently-wrong labels:
    the non-converged exit warns AND hands the graph to the
    large-star/small-star variant, so the returned labels are still
    correct (VERDICT r4 #5 upgraded ADVICE r3's warn-only behavior)."""
    import warnings

    from edgesearch_spark.operators.dedup import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(1, 8)], "a long, b long")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = {r["doc_id"]: r["cluster_id"]
               for r in connected_components(chain, max_iter=2).collect()}
    assert any("large-star" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]
    assert got == {i: 1 for i in range(1, 9)}, got  # star fallback: correct
    # and a converging run stays silent
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        connected_components(chain, max_iter=25).collect()
    assert not [w for w in rec if issubclass(w.category, RuntimeWarning)], \
        [str(w.message) for w in rec]


def test_connected_components_star_path100_converges_fast(spark):
    """Kiveris et al. large-star/small-star: a 100-node PATH graph (the
    min-label worst case — needs ~100 propagation rounds) must converge in
    ≤10 star rounds with no warning, labels = component min. Mixed with a
    star component and singletons to pin the label shape."""
    import warnings

    from edgesearch_spark.operators.dedup import connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 100)]      # path 1..100 → cluster 1
        + [(200, 201), (200, 202), (200, 203)],  # star → cluster 200
        "a long, b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(1, 101)) + [200, 201, 202, 203, 999]],
        "doc_id long")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = {r["doc_id"]: r["cluster_id"]
               for r in connected_components_star(edges, nodes=nodes,
                                                  max_iter=10).collect()}
    assert not [w for w in rec if issubclass(w.category, RuntimeWarning)], \
        [str(w.message) for w in rec]  # converged within 10
    want = {i: 1 for i in range(1, 101)}
    want.update({200: 200, 201: 200, 202: 200, 203: 200, 999: 999})
    assert got == want


def test_connected_components_star_matches_label_propagation(spark):
    """Both CC variants must produce IDENTICAL labels on an arbitrary
    multi-component graph (same fixed point, different round complexity)."""
    from edgesearch_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13),
         (20, 21), (5, 30), (30, 31), (13, 40)],
        "a long, b long",
    )
    a = {(r["doc_id"], r["cluster_id"])
         for r in connected_components(edges).collect()}
    b = {(r["doc_id"], r["cluster_id"])
         for r in connected_components_star(edges).collect()}
    assert a == b


def test_cluster_split_no_leakage_and_deterministic(spark):
    """Every near-dup edge's endpoints land in the SAME split (the property
    hash_split cannot give), assignment is stable across calls, and
    singletons still spread across splits."""
    from pyspark.sql import functions as F

    from edgesearch_spark.operators.dedup import cluster_split, connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 100)], "a long, b long")
    nodes = spark.range(200).select(F.col("id").alias("doc_id"))
    labels = connected_components_star(edges, nodes=nodes)
    split = cluster_split(labels)
    j = (edges.join(split.withColumnRenamed("doc_id", "a").withColumnRenamed("split", "sa"), "a")
              .join(split.withColumnRenamed("doc_id", "b").withColumnRenamed("split", "sb"), "b"))
    assert j.filter(F.col("sa") != F.col("sb")).count() == 0
    again = {r["doc_id"]: r["split"] for r in cluster_split(labels).collect()}
    first = {r["doc_id"]: r["split"] for r in split.collect()}
    assert first == again
    assert set(first.values()) == {"train", "validation", "test"}


def test_connected_components_star_one_row_per_node_when_not_converged(spark):
    """ADVICE r5: pre-fixpoint the edge set can mention a node on several
    edges; the output must still be one (provisional) label per node, or
    downstream cluster_split would put one doc in two splits — the exact
    leakage it exists to prevent."""
    import warnings

    from edgesearch_spark.operators.dedup import connected_components_star

    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], "a long, b long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = connected_components_star(edges, max_iter=1).collect()
    assert any("did not converge" in str(w.message) for w in caught)
    assert sorted(r["doc_id"] for r in out) == list(range(13))
