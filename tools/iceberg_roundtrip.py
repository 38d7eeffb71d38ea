"""Full Iceberg round-trip: corpus → Iceberg snapshot → read_corpus →
build_index → query → per-row sha256 parity (the north-rule input format,
exercised end-to-end).

Runs ONLY with the Iceberg Spark runtime on the classpath. Launch:

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
      tools/iceberg_roundtrip.py
or
    ICEBERG_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-1.10.0.jar \
      python tools/iceberg_roundtrip.py

Prints ICEBERG_ROUNDTRIP_OK on success (tests/test_iceberg.py's integration
test shells out to this script and asserts that marker; it skips cleanly
when no jar can be found).

Sandbox record (re-probed 2026-08-17, round 6 — unchanged: script ran,
Iceberg classes still absent from the classpath, DNS to repo1.maven.org
still fails; previously rounds 3-5): this container has NO network
(`urllib.urlopen('https://repo1.maven.org/maven2/')` → "Name or service not
known"; curl to the same → 000), no pip/apt, and no iceberg jar under
/opt/spark/jars — so offline jar vendoring is impossible here and the
integration test skips. The script itself is the reproducible recipe for
any environment with the jar.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_jar() -> str | None:
    env = os.environ.get("ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    for root in ("/opt/spark/jars", os.path.expanduser("~/.ivy2/jars")):
        hits = sorted(glob.glob(os.path.join(root, "iceberg-spark-runtime*.jar")))
        if hits:
            return hits[-1]
    return None


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    jar = find_jar()
    warehouse = "/tmp/iceberg_warehouse"
    shutil.rmtree(warehouse, ignore_errors=True)
    builder = (
        SparkSession.builder.master("local[8]")
        .appName("iceberg-roundtrip")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
        .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", warehouse)
    )
    if jar:
        builder = builder.config("spark.jars", jar)
    spark = builder.getOrCreate()

    from edgesearch_spark.build import IndexConfig, build_index
    from edgesearch_spark.corpus import generate_corpus
    from edgesearch_spark.engine import SearchEngine
    from edgesearch_spark.oracle import Query
    from edgesearch_spark.sources.iceberg import iceberg_available, read_corpus, write_snapshot

    assert iceberg_available(spark), "Iceberg classes not on the classpath"

    corpus = generate_corpus(spark, 2000, seed=11)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
    write_snapshot(corpus, "lake.db.source_files")
    back = read_corpus(spark, "lake.db.source_files")

    # per-row content sha256 parity (the BASELINE.json invariant)
    a = corpus.select("repo", "path", "commit", F.sha2("content", 256).alias("h"))
    b = back.select("repo", "path", "commit", F.sha2("content", 256).alias("h"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, "sha256 mismatch"

    out = "/tmp/iceberg_idx"
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, back, out, IndexConfig(), order_cols=("repo", "path", "commit"))
    eng = SearchEngine(spark, out)
    r = eng.search_bm25(Query.make(require=["import"], k=10))
    assert r.total > 0 and len(r.doc_ids) > 0

    # snapshot semantics: append a second snapshot, count grows
    write_snapshot(corpus.limit(100), "lake.db.source_files", mode="append")
    print("ICEBERG_ROUNDTRIP_OK", back.count(), r.total)
    spark.stop()


if __name__ == "__main__":
    main()
