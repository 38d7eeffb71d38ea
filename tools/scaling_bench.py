"""Two-parallelism scaling benchmark (BASELINE.md protocol), interleaved.

The north rule's two-cluster-size criterion can't use a real cluster here;
the sandbox equivalent is the same job at local[8] (N) vs local[32] (4N) on
identical input. The box carries co-tenant load swings, so single A/B runs
are noise-dominated — this script runs ALTERNATING 8↔32 pairs (each pair
temporally adjacent, so drift hits both sides), reports the per-pair
speedup table and the MEDIAN, plus a pure-CPU ceiling control (the same
8→32 measurement on an embarrassingly parallel burn loop: whatever it
loses to shared DRAM/SMT is the hardware's ceiling, not Spark's).

Usage: python tools/scaling_bench.py [corpus_docs] [pairs]
"""

from __future__ import annotations

import datetime
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg() -> float:
    return os.getloadavg()[0]


def run_bench(cpus: int, docs: int) -> dict:
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus), "BENCH_CORPUS_DOCS": str(docs),
           "BENCH_TRIALS": "1"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def cpu_ceiling(iters: int = 6_000_000) -> float:
    """8→32-process speedup of a pure-python burn loop: the single-box
    hardware ceiling (DRAM/SMT sharing) that no scheduler can beat."""
    import multiprocessing as mp

    def burn(_):
        x = 0
        for i in range(iters):
            x += i * i
        return x

    times = {}
    for n in (8, 32):
        with mp.Pool(n) as pool:
            t0 = time.monotonic()
            pool.map(burn, range(n * 3))
            dt = time.monotonic() - t0
        times[n] = (n * 3 * iters) / dt  # ops/sec
    return times[32] / times[8]


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rows = []
    for p in range(pairs):
        pair = {}
        for cpus in (8, 32):
            la = loadavg()
            r = run_bench(cpus, docs)
            pair[cpus] = {"docs_per_sec": r["value"], "build_sec": r["detail"]["build_sec"],
                          "loadavg_pre": round(la, 2), "detail": r["detail"]}
            print(f"pair {p} local[{cpus}]: {r['value']} docs/sec "
                  f"(build {r['detail']['build_sec']}s, loadavg {la:.1f})", flush=True)
        pair["speedup"] = pair[32]["docs_per_sec"] / pair[8]["docs_per_sec"]
        rows.append(pair)
        print(f"pair {p}: speedup {pair['speedup']:.2f}x", flush=True)

    speedups = [r["speedup"] for r in rows]
    med = statistics.median(speedups)
    eff = med / 4.0
    ceiling = cpu_ceiling()
    eff_vs_ceiling = med / ceiling
    t32 = statistics.median([r[32]["docs_per_sec"] for r in rows])
    t8 = statistics.median([r[8]["docs_per_sec"] for r in rows])
    d32 = rows[-1][32]["detail"]

    lines = [
        "# BENCH — measured scaling results",
        "",
        f"Generated {datetime.date.today().isoformat()} by tools/scaling_bench.py; "
        f"deterministic synthetic corpus (corpus.py, seed=42), {docs:,} docs, "
        f"identical input at both parallelism levels, {pairs} interleaved 8↔32 pairs "
        "(adjacent in time so co-tenant drift hits both sides of every pair).",
        "",
        "## Interleaved A/B pairs — index-build throughput",
        "",
        "| pair | local[8] docs/s | loadavg | local[32] docs/s | loadavg | speedup |",
        "|---|---|---|---|---|---|",
    ]
    for i, r in enumerate(rows):
        lines.append(
            f"| {i} | {r[8]['docs_per_sec']:,.0f} | {r[8]['loadavg_pre']} | "
            f"{r[32]['docs_per_sec']:,.0f} | {r[32]['loadavg_pre']} | {r['speedup']:.2f}× |"
        )
    lines += [
        "",
        f"- median throughput: local[8] **{t8:,.0f}** docs/s, local[32] **{t32:,.0f}** docs/s",
        f"- per-pair speedups: {[round(s, 2) for s in speedups]}",
        f"- **median speedup 8→32 (4× cores): {med:.2f}×** → efficiency vs ideal 4×: **{eff:.2f}**",
        f"- pure-CPU control (multiprocessing burn loop, same 8→32): **{ceiling:.2f}×** — the",
        "  single-box hardware ceiling: 32 threads share DRAM bandwidth and SMT siblings, so",
        "  even an embarrassingly parallel, shuffle-free workload cannot reach 4.0× here.",
        f"- **efficiency vs the hardware ceiling: {eff_vs_ceiling:.2f}**",
        "",
        "Reading: on a REAL 4N-executor cluster the added cores bring their own memory",
        "bandwidth and disks, so the ceiling control (not the ideal 4×) is the honest",
        "denominator for this single-box proxy; the plan properties that carry the 4×",
        "to disjoint executors (one hash shuffle on (term, salt); range-bucket salting",
        "caps every task at 2^salt_shift postings; no single-partition stage) are",
        "asserted in tests/test_plans.py and build.py:344-411.",
        "",
        "## Adaptive-codec footprint (this corpus, local[32] run)",
        "",
        f"- postings payload: **{d32.get('payload_bytes', 0):,} bytes**, "
        f"**{d32.get('bits_per_posting', '?')} bits/posting** (delta+varint/run/bitset per-block pick,",
        "  constant-tf elision; see codec.py).",
        "",
        "## Per-query latencies (local[32], seconds)",
        "",
        "```json",
        json.dumps(rows[-1][32]["detail"], indent=2),
        "```",
        "",
        "## Running against a real Iceberg lakehouse",
        "",
        "```bash",
        "spark-submit \\",
        "  --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.8.0 \\",
        "  --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\",
        "  --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\",
        "  --conf spark.sql.catalog.lake.type=hive \\",
        "  --py-files edgesearch_spark.zip tools/submit_job.py lake.db.source_files /out/index",
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"median speedup={med:.2f}x eff={eff:.2f} ceiling={ceiling:.2f} "
          f"eff_vs_ceiling={eff_vs_ceiling:.2f} → BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
