"""Iceberg source dispatch (north-rule input format). The sandbox has no
Iceberg jars and no network, so the catalog branch is exercised with a
recorded test double asserting the exact DataSource call; the parquet
fallback runs for real end-to-end into an index build. BENCH/BASELINE.md
documents the spark-submit --packages recipe for a real lakehouse."""

import os

import pytest

from edgesearch_spark.sources import iceberg as ice


class _Recorder:
    def __init__(self):
        self.calls = []
        self._fmt = None

    # spark.read surface
    def format(self, fmt):
        self._fmt = fmt
        return self

    def load(self, name):
        self.calls.append(("load", self._fmt, name))
        return f"df:{self._fmt}:{name}"

    def parquet(self, path):
        self.calls.append(("parquet", None, path))
        return f"df:parquet:{path}"


class _FakeSpark:
    def __init__(self):
        self.read = _Recorder()


def test_table_name_dispatches_to_iceberg(monkeypatch):
    monkeypatch.setattr(ice, "iceberg_available", lambda spark: True)
    fake = _FakeSpark()
    out = ice.read_corpus(fake, "lake.db.source_files")
    assert out == "df:iceberg:lake.db.source_files"
    assert fake.read.calls == [("load", "iceberg", "lake.db.source_files")]


def test_path_always_uses_parquet_even_with_iceberg(monkeypatch):
    monkeypatch.setattr(ice, "iceberg_available", lambda spark: True)
    fake = _FakeSpark()
    out = ice.read_corpus(fake, "/data/corpus.parquet")
    assert out == "df:parquet:/data/corpus.parquet"


def test_table_name_without_jars_falls_back(monkeypatch):
    monkeypatch.setattr(ice, "iceberg_available", lambda spark: False)
    fake = _FakeSpark()
    ice.read_corpus(fake, "lake.db.source_files")
    assert fake.read.calls == [("parquet", None, "lake.db.source_files")]


def test_write_snapshot_dispatch(monkeypatch):
    events = []

    class _W:
        def __init__(self, name):
            self.name = name

        def createOrReplace(self):
            events.append(("createOrReplace", self.name))

    class _DF:
        sparkSession = _FakeSpark()

        def writeTo(self, name):
            return _W(name)

    monkeypatch.setattr(ice, "iceberg_available", lambda spark: True)
    ice.write_snapshot(_DF(), "lake.db.out")
    assert events == [("createOrReplace", "lake.db.out")]


def test_parquet_fallback_reads_real_corpus_into_build(spark, tmp_path_factory):
    """The fallback branch is not a stub: read_corpus(path) feeds the real
    builder and the index answers queries."""
    from edgesearch_spark.build import IndexConfig, build_index
    from edgesearch_spark.corpus import generate_corpus
    from edgesearch_spark.engine import SearchEngine
    from edgesearch_spark.oracle import Query

    src = str(tmp_path_factory.mktemp("ice_src")) + "/corpus"
    generate_corpus(spark, 200, seed=4).write.parquet(src)
    corpus = ice.read_corpus(spark, src)
    assert set(corpus.columns) >= {"repo", "path", "commit", "lang", "content"}
    out = str(tmp_path_factory.mktemp("ice_idx"))
    build_index(spark, corpus, out, IndexConfig(), order_cols=("repo", "path", "commit"))
    eng = SearchEngine(spark, out)
    assert eng.search(Query.make(require=["import"], k=5)).total > 0


def test_iceberg_available_is_false_in_sandbox(spark):
    # documents the environment assumption the double relies on
    assert ice.iceberg_available(spark) is False


def test_iceberg_full_roundtrip_when_runtime_present():
    """FULL read→build→write_snapshot round-trip (tools/iceberg_roundtrip.py)
    in a dedicated JVM with the Iceberg runtime jar — skips cleanly when no
    jar is findable (this sandbox: no network, no jar; the script docstring
    records the reproducible failure evidence)."""
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from iceberg_roundtrip import find_jar

    if find_jar() is None:
        pytest.skip("no iceberg-spark-runtime jar available (offline sandbox)")
    script = os.path.join(os.path.dirname(__file__), "..", "tools", "iceberg_roundtrip.py")
    res = subprocess.run([sys.executable, script], capture_output=True, text=True, timeout=600)
    assert "ICEBERG_ROUNDTRIP_OK" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]
