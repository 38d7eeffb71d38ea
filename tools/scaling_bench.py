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
           "BENCH_TRIALS": "1",
           # scaling pairs measure BUILD throughput; one query sweep per
           # invocation keeps pair cadence at the r3 protocol's
           "BENCH_QUERY_TRIALS": "1",
           # pair cadence: no positions build, no prev-round control inside
           # pairs (the official bench run carries both once per round)
           "BENCH_POSITIONS": "0", "BENCH_PREV_CONTROL": "0"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    r = json.loads(out.stdout.strip().splitlines()[-1])
    # the stdout line is the driver-parseable COMPACT summary (r4 fix);
    # per-stage seconds and codec footprint live in the full-detail artifact
    try:
        with open(os.path.join(REPO, "BENCH", "last_run.json")) as f:
            full = json.load(f)["detail"]
        # bench.py swallows OSError on that file's write — a stale file from
        # the OTHER parallelism level would corrupt the A/B record, so only
        # attach detail that self-identifies as this run's
        if full.get("cores") == cpus and full.get("build_sec") == r["detail"]["build_sec"]:
            r["detail"] = full
    except (OSError, ValueError, KeyError):
        pass
    return r


def _burn(iters: int) -> int:
    x = 0
    for i in range(iters):
        x += i * i
    return x


def _copy_bw(_) -> float:
    import numpy as np

    a = np.ones((64 << 20) >> 3, np.int64)
    b = np.empty_like(a)
    t0 = time.monotonic()
    n = 0
    while time.monotonic() - t0 < 3.0:
        np.copyto(b, a)
        n += 1
    return n * 128.0  # MB moved


def cpu_ceiling(iters: int = 6_000_000) -> float:
    """8→32-process speedup of a pure-python burn loop: the single-box
    COMPUTE ceiling (SMT/host oversubscription) no scheduler can beat."""
    import multiprocessing as mp

    times = {}
    for n in (8, 32):
        with mp.Pool(n) as pool:
            t0 = time.monotonic()
            pool.map(_burn, [iters] * (n * 3))
            dt = time.monotonic() - t0
        times[n] = (n * 3 * iters) / dt  # ops/sec
    return times[32] / times[8]


def mem_bw_ceiling() -> tuple[float, float, float]:
    """Aggregate big-array copy bandwidth at 8 vs 32 procs — the MEMORY
    ceiling. On this host bandwidth can DEGRADE past 8 threads; a shuffle-
    heavy stage cannot scale past this no matter the plan."""
    import multiprocessing as mp

    out = {}
    for n in (8, 32):
        with mp.Pool(n) as pool:
            r = pool.map(_copy_bw, range(n))
        out[n] = sum(r) / 3.0 / 1024.0  # GB/s
    return out[8], out[32], out[32] / out[8]


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
    bw8, bw32, bw_ratio = mem_bw_ceiling()
    eff_vs_ceiling = med / ceiling
    t32 = statistics.median([r[32]["docs_per_sec"] for r in rows])
    t8 = statistics.median([r[8]["docs_per_sec"] for r in rows])
    d32 = rows[-1][32]["detail"]

    # per-stage medians (which stages scale, which hit the memory wall)
    stage_rows = []
    for s in ("docs", "stats", "postings", "terms"):
        try:
            s8 = statistics.median(r[8]["detail"]["stage_seconds"][s] for r in rows)
            s32 = statistics.median(r[32]["detail"]["stage_seconds"][s] for r in rows)
            stage_rows.append((s, s8, s32, s8 / s32))
        except KeyError:
            pass

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
        "",
        "## Hardware controls (what this box can physically give 8→32)",
        "",
        f"- pure-CPU burn loop (no memory traffic): **{ceiling:.2f}×** — SMT siblings +",
        "  host oversubscription cap even embarrassingly parallel compute below 4.0×.",
        f"- big-array copy bandwidth: **{bw8:.1f} GB/s at 8 procs → {bw32:.1f} GB/s at 32",
        f"  procs = {bw_ratio:.2f}×**"
        + (" — memory bandwidth scales WORSE than compute here, capping shuffle/sort/transfer-bound stages harder."
           if bw_ratio < ceiling else
           " — the memory-traffic ceiling; both controls sit well under the ideal 4.0×."),
        "  (Both controls swing with co-tenant load; they are sampled in the same window",
        "  as the pairs above.)",
        f"- **efficiency vs the compute ceiling: {eff_vs_ceiling:.2f}**; the build blends",
        "  CPU-bound stages (tokenize/encode) with memory-bound ones (shuffle/sort/Arrow",
        "  transfer), so its achievable band on this box lies between the two controls.",
        "",
        "## Per-stage scaling (medians)",
        "",
        "| stage | local[8] s | local[32] s | speedup |",
        "|---|---|---|---|",
        *[f"| {s} | {a:.1f} | {b:.1f} | {r:.2f}× |" for s, a, b, r in stage_rows],
        "",
        "Reading: on a REAL 4N-executor cluster the added executors bring their own",
        "memory channels and disks, so neither single-box ceiling applies; the plan",
        "properties that carry 4× to disjoint executors (ONE hash shuffle on",
        "(term, salt); range-bucket salting caps every task at 2^salt_shift postings;",
        "no single-partition stage anywhere) are asserted in tests/test_plans.py and",
        "build.py:344-411, and the per-stage table shows the wall time is dominated by",
        "stages whose single-box ceiling is the memory control, not by serial work.",
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
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    # preserve hand-written sections (profiling tables etc.) the generator
    # does not own: everything between PRESERVED markers in the old file is
    # re-inserted before the codec-footprint section
    preserved = ""
    try:
        with open(out_path) as f:
            old = f.read()
        lo = old.index("## Postings-stage substage profile")
        hi = old.index("## Adaptive-codec footprint")
        preserved = old[lo:hi]
    except (OSError, ValueError):
        pass
    text = "\n".join(lines) + "\n"
    if preserved:
        text = text.replace("## Adaptive-codec footprint", preserved + "## Adaptive-codec footprint", 1)
    with open(out_path, "w") as f:
        f.write(text)
    print(f"median speedup={med:.2f}x eff={eff:.2f} ceiling={ceiling:.2f} "
          f"eff_vs_ceiling={eff_vs_ceiling:.2f} → BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
