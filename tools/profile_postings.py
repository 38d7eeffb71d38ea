"""Per-substage profile of the postings build stage (VERDICT r2 item 3).

Decomposes the stage wall time by running nested prefixes of the same plan
on the same materialized corpus:

  T1 tokenize            tokenize_pairs_arrow -> noop sink
  T2 +shuffle+sort       ... -> repartition(term, doc>>shift) -> sort -> noop
  T3 +arrow crossing     ... -> identity mapInArrow (rows cross into the
                         Python worker and back, zero compute) -> noop
  T4 +encode (full)      ... -> real streaming encoder -> noop

so  tokenize ≈ T1, shuffle+sort ≈ T2-T1, Arrow crossing ≈ T3-T2,
encode Python compute ≈ T4-T3. Each action also reports the Spark
statusStore aggregates (shuffle bytes, executor run/CPU/GC time) and the
encoder run carries in-worker accumulators separating time blocked on
Arrow IPC input from time inside the encode function.

Usage: [BENCH_CORPUS_DOCS=300000] [SPARK_GRAFT_CPUS=32] python tools/profile_postings.py
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from edgesearch_spark.arrow_pipeline import (  # noqa: E402
    make_stream_encoder_arrow,
    tokenize_pairs_arrow,
)
from edgesearch_spark.build import IndexConfig, tf_weight_col  # noqa: E402
from edgesearch_spark.corpus import generate_corpus  # noqa: E402
from edgesearch_spark.session import get_spark  # noqa: E402


def _stage_metrics(sc, known_ids: set) -> tuple[dict, set]:
    """New-stage aggregates from the Spark UI REST API (statusStore's py4j
    surface has Scala default-arg signatures py4j cannot call)."""
    import urllib.request

    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
    stages = json.load(urllib.request.urlopen(url))
    out = {"shuffle_write_mb": 0.0, "shuffle_read_mb": 0.0,
           "executor_run_s": 0.0, "executor_cpu_s": 0.0, "jvm_gc_s": 0.0}
    ids = set()
    for s in stages:
        sid = (s["stageId"], s["attemptId"])
        ids.add(sid)
        if sid in known_ids:
            continue
        out["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
        out["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
        out["executor_run_s"] += s.get("executorRunTime", 0) / 1e3
        out["executor_cpu_s"] += s.get("executorCpuTime", 0) / 1e9
        out["jvm_gc_s"] += s.get("jvmGcTime", 0) / 1e3
    return {k: round(v, 2) for k, v in out.items()}, ids


def timed_encoder(fn, acc_in, acc_fn):
    """Wrap a mapInArrow function: acc_in = seconds blocked reading input
    batches from the JVM (Arrow IPC wait), acc_fn = total seconds inside the
    function (compute + that wait)."""

    def inner(batches):
        import time as _t

        def timed_in():
            it = iter(batches)
            while True:
                t0 = _t.perf_counter()
                try:
                    b = next(it)
                except StopIteration:
                    return
                acc_in.add(_t.perf_counter() - t0)
                yield b

        out_it = fn(timed_in())
        while True:
            t0 = _t.perf_counter()
            try:
                out = next(out_it)
            except StopIteration:
                return
            acc_fn.add(_t.perf_counter() - t0)
            yield out

    return inner


def main() -> None:
    n_docs = int(os.environ.get("BENCH_CORPUS_DOCS", "300000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="profile-postings", cores=cpus, shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    cfg = IndexConfig()

    corpus_path = f"/tmp/bench_corpus_{n_docs}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        generate_corpus(spark, n_docs, seed=42).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    # stable avgdl stand-in (profiling the plan, not the stats stage)
    avgdl = 40.0
    w_col = tf_weight_col(cfg.k1, cfg.b, avgdl)
    n_part = cpus

    def tokenized():
        p = tokenize_pairs_arrow(docs, "doc_id", "content")
        return p.withColumn("w", w_col).select("term", "doc_id", "tf", "w")

    def shuffled():
        return tokenized().repartition(
            4 * n_part, "term", F.shiftright(F.col("doc_id"), cfg.salt_shift)
        ).sortWithinPartitions("term", "doc_id")

    def identity_fn(batches):
        for b in batches:
            yield b

    from edgesearch_spark.arrow_pipeline import POSTINGS_ARROW_SCHEMA  # noqa: F401

    acc_in = sc.accumulator(0.0)
    acc_fn = sc.accumulator(0.0)
    runs = {
        "T1_tokenize": lambda: tokenized(),
        "T2_plus_shuffle_sort": lambda: shuffled(),
        "T3_plus_arrow_crossing": lambda: shuffled().mapInArrow(
            identity_fn, schema="term string, doc_id long, tf long, w float"
        ),
        "T4_full_encode": lambda: shuffled().mapInArrow(
            timed_encoder(make_stream_encoder_arrow(cfg.block_size, cfg.salt_shift), acc_in, acc_fn),
            schema=POSTINGS_ARROW_SCHEMA.to_string() if False else
            "term string, salt long, df long, cf long, block_first_doc array<long>,"
            "block_max_doc array<long>, block_count array<int>, block_offset array<long>,"
            "block_max_weight array<float>, block_kind array<int>, payload binary",
        ),
    }

    # untimed warmup: codegen compile + python worker spawn + page cache
    runs["T4_full_encode"]().write.format("noop").mode("overwrite").save()
    acc_in.value, acc_fn.value = 0.0, 0.0

    iters = int(os.environ.get("PROFILE_ITERS", "2"))
    known: set = set()
    _, known = _stage_metrics(sc, set())
    result: dict = {"n_docs": n_docs, "cores": cpus, "iters": iters, "substages": {}}
    for name, mk in runs.items():
        best = None
        for it in range(iters):
            t0 = time.monotonic()
            mk().write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            m, known = _stage_metrics(sc, known)
            if best is None or dt < best[0]:
                best = (dt, m)
        result["substages"][name] = {"wall_s": round(best[0], 2), **best[1]}

    t = result["substages"]
    result["decomposition_s"] = {
        "tokenize": t["T1_tokenize"]["wall_s"],
        "shuffle_sort": round(t["T2_plus_shuffle_sort"]["wall_s"] - t["T1_tokenize"]["wall_s"], 2),
        "arrow_crossing": round(
            t["T3_plus_arrow_crossing"]["wall_s"] - t["T2_plus_shuffle_sort"]["wall_s"], 2),
        "encode_python": round(
            t["T4_full_encode"]["wall_s"] - t["T3_plus_arrow_crossing"]["wall_s"], 2),
    }
    # worker-side accumulators for the LAST full-encode run (per-core sums)
    result["encoder_worker_s"] = {
        "arrow_ipc_input_wait_total": round(acc_in.value, 1),
        "inside_encode_fn_total": round(acc_fn.value, 1),
        "pure_compute_total": round(acc_fn.value - acc_in.value, 1),
        "note": "totals across all worker processes and iters; divide by cores for wall-clock share",
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
