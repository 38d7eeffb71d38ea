"""SearchApp — the worker-equivalent end-to-end request surface.

Ties api.py (parsing + response shapes) to engine.py (kernel) the way the
reference worker's handleSearch does (script/src/main.ts:346-437):

  GET /search?t=0_hello&t=1_world&c=0
    → parse (400 on malformed) → term-count check (413) → kernel
    → doc fetch join → streamed-JSON body

Responses mirror the reference byte-shape: `{"total":…,"continuation":…,
"results":[…]}` with results spliced as pre-serialized payloads, plus the
reference's error shapes (`{"error":…}` with status). ``scored=True``
switches ranking to BM25 (our additive layer) while keeping the envelope.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .api import no_results_response, parse_query_url, search_response
from .engine import SearchEngine
from .oracle import QueryTooLarge


@dataclass
class Response:
    status: int
    body: str


class SearchApp:
    def __init__(self, spark: SparkSession, index_dir: str, payload_col: str = "content"):
        self.engine = SearchEngine(spark, index_dir)
        self.payload_col = payload_col

    def handle_search(self, url: str, scored: bool = False) -> Response:
        q = parse_query_url(url, k=self.engine.max_results)
        if q is None:
            return Response(400, json.dumps({"error": "Malformed query"}))
        try:
            result = self.engine.search_bm25(q) if scored else self.engine.search(q)
        except QueryTooLarge:
            return Response(413, json.dumps({"error": "Too many terms"}))
        # ONLY a missing REQUIRE term gets the http.ts:30-31 short-circuit
        # shape; an empty boolean intersection goes through the normal
        # streamed envelope (key order total/continuation/results)
        if q.require and any(p is None for p in self.engine.fetch_terms(list(q.require)).values()):
            return Response(200, no_results_response())
        # doc fetch preserving rank order (reference Q15 + response assembly)
        rows = {r["doc_id"]: r for r in self.engine.fetch_docs(list(result.doc_ids)).collect()}
        payloads = [json.dumps(rows[d][self.payload_col]) for d in result.doc_ids if d in rows]
        return Response(200, search_response(result, payloads))
