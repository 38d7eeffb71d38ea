"""Two-parallelism scaling benchmark (BASELINE.md protocol).

Runs bench.py in two fresh processes — local[8] (N) and local[32] (4N) —
on the identical deterministic corpus, and writes the results table +
scaling efficiency to BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [corpus_docs] [trials]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, docs: int) -> dict:
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus), "BENCH_CORPUS_DOCS": str(docs)}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    results: dict[int, dict] = {}
    for cpus in (8, 32):
        best = None
        for _ in range(trials):
            r = run_bench(cpus, docs)
            if best is None or r["value"] > best["value"]:
                best = r
        results[cpus] = best
        print(f"local[{cpus}]: {best['value']} docs/sec (build {best['detail']['build_sec']}s)")

    t8, t32 = results[8]["value"], results[32]["value"]
    speedup = t32 / t8
    eff = speedup / 4.0
    lines = [
        "# BENCH — measured results (round 1)",
        "",
        f"Generated {datetime.date.today().isoformat()} by tools/scaling_bench.py; "
        f"deterministic synthetic corpus (corpus.py, seed=42), {docs:,} docs, "
        "identical input at both parallelism levels (per-run best of "
        f"{trials} trial(s)).",
        "",
        "## Index-build throughput at two parallelism levels",
        "",
        "| parallelism | build sec | docs/sec | query p50 | query p95 |",
        "|---|---|---|---|---|",
    ]
    for cpus in (8, 32):
        d = results[cpus]["detail"]
        lines.append(
            f"| local[{cpus}] | {d['build_sec']} | {results[cpus]['value']} | "
            f"{d['query_p50_sec']} | {d['query_p95_sec']} |"
        )
    lines += [
        "",
        f"- speedup local[8]→local[32] (4× cores): **{speedup:.2f}×**",
        f"- scaling efficiency (speedup / 4): **{eff:.2f}**",
        "",
        "Caveats: single machine, shared memory bandwidth and shuffle disk —",
        "local[8] and local[32] compete for the same hardware resources, so",
        "efficiency here is a lower bound on what disjoint executors achieve;",
        "the raw numbers above keep the arithmetic auditable (BASELINE.md).",
        "",
        "## Per-query latencies (local[32], seconds)",
        "",
        "```json",
        json.dumps(results[32]["queries"], indent=2),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"speedup={speedup:.2f}x efficiency={eff:.2f} → BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
