"""Physical-plan quality gates: the properties that keep this engine fast at
100 TB must be visible in the plan, not assumed.

- term lookups push down to the parquet scan (the chunk-pruning analogue,
  SURVEY.md §4 row 1)
- projections prune columns at the scan
- the per-term df join in BM25 broadcasts (no shuffle of the big side)
- the relational hot paths contain no Python eval nodes
"""

import contextlib
import io
import shutil

import pytest
from pyspark.sql import functions as F

from edgesearch_spark.build import IndexConfig, build_index
from edgesearch_spark.corpus import generate_corpus


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("planidx"))
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, generate_corpus(spark, 300, seed=1), out, IndexConfig(),
                order_cols=("repo", "path", "commit"))
    return out


def test_term_filter_pushed_to_scan(spark, index_dir):
    df = spark.read.parquet(f"{index_dir}/postings").filter(F.col("term").isin(["import", "def"]))
    plan = plan_of(df)
    assert "PushedFilters" in plan and "In(term" in plan, plan


def test_column_pruning_at_scan(spark, index_dir):
    df = spark.read.parquet(f"{index_dir}/docs").select("doc_id", "lang")
    plan = plan_of(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "content" not in read_schema[0], plan


def test_bm25_topk_plan_is_joinless_single_pass(spark):
    """r8 rewrite: per-term tf/df come from anchored regexp_counts and
    driver-literal idfs — the plan must carry NO join of any kind (the old
    shape's broadcast df join is gone entirely), no groupBy exchange, and
    finish with a TakeOrderedAndProject (never a global sort)."""
    from edgesearch_spark.plans.contract import q_bm25_topk

    plan = plan_of(q_bm25_topk(spark, "/root/testdata/sf0.001"))
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "HashAggregate" not in plan, plan


def test_relational_paths_have_no_python_eval(spark):
    from edgesearch_spark.plans.contract import q_bool_mixed, q_term_df, q_tokenize_pairs

    for q in (q_tokenize_pairs, q_term_df, q_bool_mixed):
        plan = plan_of(q(spark, "/root/testdata/sf0.001"))
        assert "EvalPython" not in plan, (q.__name__, plan)


def test_doc_fetch_join_broadcasts(spark, index_dir):
    from edgesearch_spark.engine import SearchEngine

    eng = SearchEngine(spark, index_dir)
    plan = plan_of(eng.fetch_docs([1, 2, 3]))
    assert "BroadcastHashJoin" in plan, plan


def test_lazy_metadata_scan_prunes_payload_column(spark, index_dir):
    """The hot-term metadata fetch must never read the payload column: its
    ReadSchema at the parquet scan excludes `payload` (column pruning is the
    entire point of metadata-first laziness)."""
    from edgesearch_spark.engine import SearchEngine

    eng = SearchEngine(spark, index_dir)
    meta = eng._postings_df.select(*SearchEngine._META_COLS).filter(F.col("term") == "import")
    plan = plan_of(meta)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and all("payload" not in ln for ln in rs), plan
