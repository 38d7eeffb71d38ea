"""Freeze the reference query set + goldens (FIXTURES.md F5).

Computes goldens with the brute-force oracle over the deterministic corpus
(seed=42, n=400, same global order as the engine's docID assignment) and
writes tests/goldens/query_set.json. Run once; the committed file then pins
query semantics across rounds (tests/test_goldens.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edgesearch_spark.corpus import generate_corpus_pandas  # noqa: E402
from edgesearch_spark.oracle import BruteForceOracle, Query, QueryTooLarge  # noqa: E402

N = 400
SEED = 42

QUERY_SPECS = {
    "single_require": dict(require=["import"]),
    "multi_require": dict(require=["import", "return"]),
    "require_rare": dict(require=["license", "util5"]),
    "contain_only": dict(contain=["util3", "helper7", "struct"]),
    "require_contain": dict(require=["the"], contain=["util1", "util2"]),
    "require_exclude": dict(require=["data"], exclude=["error"]),
    "all_modes": dict(require=["value"], contain=["util9"], exclude=["test", "main"]),
    "missing_require": dict(require=["zzz_missing"]),
    "missing_contain_dropped": dict(require=["import"], contain=["zzz_missing"]),
    "missing_exclude_dropped": dict(require=["import"], exclude=["zzz_missing"]),
    "exclude_only_quirk": dict(exclude=["license"]),
    "exclude_only_all_missing": dict(exclude=["zzz_missing"]),
    "empty_query": dict(),
    "default_near_end": dict(continuation=390),
    "default_past_end": dict(continuation=1000),
    "paginate_mid": dict(require=["the"], continuation=37, k=10),
    "paginate_past_end": dict(require=["the"], continuation=10_000),
    "singleton_term": dict(require=["uid00000010"]),
    "hot_plus_singletons": dict(require=["import"], contain=["uid00000020", "uid00000021"]),
}


def main() -> None:
    pdf = generate_corpus_pandas(N, seed=SEED).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    oracle = BruteForceOracle(list(zip(range(len(pdf)), pdf["content"])))
    goldens = {}
    for name, spec in QUERY_SPECS.items():
        q = Query.make(**spec)
        b = oracle.search(q)
        s = oracle.search_bm25(q)
        goldens[name] = {
            "query": spec,
            "boolean": {"total": b.total, "continuation": b.continuation, "doc_ids": b.doc_ids},
            "bm25": {
                "total": s.total,
                "continuation": s.continuation,
                "doc_ids": s.doc_ids,
                "scores": [round(x, 9) for x in s.scores],
            },
        }
    # over-limit query: golden is the error itself
    try:
        oracle.search(Query.make(require=[f"t{i}" for i in range(60)]))
        raise AssertionError("expected QueryTooLarge")
    except QueryTooLarge:
        goldens["too_many_terms"] = {"query": {"require": [f"t{i}" for i in range(60)]}, "error": "QueryTooLarge"}

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "query_set.json")
    with open(path, "w") as f:
        json.dump({"corpus": {"n": N, "seed": SEED, "order": ["repo", "path", "commit"]}, "queries": goldens}, f, indent=1)
    print(f"wrote {path} ({len(goldens)} queries)")


if __name__ == "__main__":
    main()
