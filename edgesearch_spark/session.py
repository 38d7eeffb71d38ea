"""SparkSession factory with the configs this engine assumes.

Local mode for tests/bench; on a real cluster these configs come from
spark-submit. AQE on (runtime re-plan + skew-join), Arrow on (pandas-UDF
hot paths), UTC timezone (DuckDB-oracle comparability).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip this package for --py-files-style shipping to executors.
    ``get_spark`` registers it via ``sc.addPyFile`` so UDF closures that
    reference edgesearch_spark modules resolve on Python workers no matter
    the driver's cwd — the same artifact a cluster run passes to
    ``spark-submit --py-files``."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(), "edgesearch_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join("edgesearch_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    return out


# glibc malloc returns every >128 KB allocation to the kernel on free
# (mmap/munmap per numpy temporary). The vectorized tokenizer/encoder
# allocate large short-lived arrays per Arrow batch, so with 32 python
# workers the kernel page-fault path serializes the whole postings stage
# (measured on this host: 32-way allocation churn 4.5 → 10.6 GB/s with the
# thresholds raised — heap reuse instead of mmap churn). Exported to local
# python workers via the driver env, and to cluster executors below.
_MALLOC_TUNING = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
}


def get_spark(
    app_name: str = "edgesearch_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    for k, v in _MALLOC_TUNING.items():
        os.environ.setdefault(k, v)  # local-mode python daemon inherits this
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # 10k-row Arrow batches fragment pandas-UDF work into thousands of
        # tiny calls (measured: the posting encoder spent most of its time in
        # per-batch overhead); 128k rows keeps tokenizer input batches well
        # under memory while cutting encoder batch count ~13× (measured a
        # further ~9% off the encode stage vs 64k; 256k was flat)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        # shuffle spill/blocks in shared memory: local-mode shuffles stream
        # through spark.local.dir, and a disk-backed dir makes shuffle I/O a
        # core-count-independent bottleneck (this box: ~780 MB/s disk, 126 GB
        # free tmpfs). Cluster deployments override via SPARK_LOCAL_DIRS.
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIR", "/dev/shm/spark-local"))
    )
    for k, v in _MALLOC_TUNING.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(package_zip())
    return spark
