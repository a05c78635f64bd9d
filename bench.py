"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "n_triples": ..., "triples_per_sec": ...}

Scaling mode (`--scaling`): run the flagship KG-construction job in two
fresh subprocesses at local[8] and local[32] on the same input (the
sandbox proxy for the north rule's N -> 4N executor criterion), compute
throughput scaling efficiency = (T8/T32)/4, and append the measured table
to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "kg_pipeline_throughput",
    "kg_triples",
    "kg_episodes",
    "kg_nodes",
    "kg_mentions",
    "doc_tokens",
    "doc_quality",
    "doc_fingerprint",
    "doc_ngram_pairs",
    "ann_topk",
]


def run_bench(sf_dir: str, cpus: int, names: list[str]) -> dict:
    from graphiti_spark import registry
    from graphiti_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    n_triples = 0
    tput = {}
    for name in names:
        registry._GRAPH_CACHE.clear()  # no cross-query reuse: honest per-query cost
        spark.catalog.clearCache()
        if name == "kg_pipeline_throughput":
            # meaningful end-to-end throughput: the corpus at replicate=1
            # is overhead-dominated, so the throughput probe runs the full
            # construction DAG on a 20x deterministic replication and
            # reports raw extracted triples per second
            from graphiti_spark.plans.pipeline import build_graph, triples_view

            t0 = time.perf_counter()
            t = build_graph(spark, sf_dir, replicate=20)
            triples_view(t).count()
            dt = time.perf_counter() - t0
            raw = t.triples_raw.count()
            timings[name] = round(dt, 3)
            tput = {"n_raw_triples": raw, "raw_triples_per_sec": round(raw / dt, 1)}
            continue
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        if name == "kg_triples":
            n_triples = n
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "n_triples": n_triples,
        **tput,
    }
    spark.stop()
    return out


SCALING_SNIPPET = """
import json, time, sys
from graphiti_spark.session import get_spark
from graphiti_spark.plans.pipeline import build_graph, triples_view
cpus, sf_dir, R = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
# warm-up at full size (python worker spawn, JIT, codegen), then honest
# timed runs with the DataFrame cache cleared between them
t = build_graph(spark, sf_dir, replicate=R); triples_view(t).count()
n_raw = t.triples_raw.count()
spark.catalog.clearCache()
times = []
for i in range(3):
    t0 = time.perf_counter()
    t = build_graph(spark, sf_dir, replicate=R)
    n = triples_view(t).count()
    times.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
print(json.dumps({"cpus": cpus, "times": times, "n_raw": n_raw, "n_canonical": n}))
"""

CALIBRATION_SNIPPET = """
import json, multiprocessing as mp, sys, time
def spin(_):
    t0 = time.perf_counter(); x = 0
    for i in range(30_000_000): x += i
    return time.perf_counter() - t0
out = {}
for n in (8, 32):
    with mp.Pool(n) as pool:
        t0 = time.perf_counter(); pool.map(spin, range(n))
        out[n] = round(n / (time.perf_counter() - t0), 2)
print(json.dumps(out))
"""


def run_scaling(sf_dir: str, replicate: int = 100) -> dict:
    """The north-rule N -> 4N evidence, sandbox proxy: the same flagship
    KG-construction job at local[8] vs local[32] on the same input, warm
    (workers spawned, JIT done), min of 3 runs. Also measures the
    MACHINE's own 8->32 pure-CPU scaling ceiling (this VM does not
    deliver 4x from 8 to 32 threads even for plain multiprocessing), and
    reports job efficiency normalized by that ceiling."""
    results = {}
    env = {**os.environ, "SPARK_GRAFT_DRIVER_MEM": "48g"}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, "-c", SCALING_SNIPPET, str(cpus), sf_dir, str(replicate)],
            capture_output=True, text=True, cwd=REPO, env=env,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    cal = subprocess.run(
        [sys.executable, "-c", CALIBRATION_SNIPPET],
        capture_output=True, text=True,
    )
    calib = json.loads(cal.stdout.splitlines()[-1])
    hw_eff = round(calib["32"] / calib["8"] / 4, 3)

    t8 = min(results[8]["times"])
    t32 = min(results[32]["times"])
    n = results[8]["n_raw"]
    eff = round((t8 / t32) / 4, 3)
    summary = {
        "metric": "kg_construct_scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "sf": sf_dir,
        "replicate": replicate,
        "n_raw_triples": n,
        "n_canonical_edges": results[8]["n_canonical"],
        "sec_local8": t8,
        "sec_local32": t32,
        "times_local8": results[8]["times"],
        "times_local32": results[32]["times"],
        "triples_per_sec_local8": round(n / t8, 1),
        "triples_per_sec_local32": round(n / t32, 1),
        "hw_ceiling_efficiency_8_to_32": hw_eff,
        "efficiency_vs_hw_ceiling": round(eff / hw_eff, 3) if hw_eff else None,
    }
    _append_bench_md(summary)
    return summary


def _append_bench_md(s: dict) -> None:
    path = os.path.join(REPO, "BENCH.md")
    header = not os.path.exists(path)
    with open(path, "a") as f:
        if header:
            f.write(
                "# BENCH — measured KG-construction throughput & scaling\n\n"
                "North rule: throughput scaling efficiency >= 0.8 from N to 4N\n"
                "parallelism; sandbox proxy = local[8] vs local[32], same input.\n"
                "Efficiency = (T_N / T_4N) / 4.\n\n"
                "| input | raw triples | sec local[8] | sec local[32] | tps local[8] "
                "| tps local[32] | efficiency | hw ceiling eff | eff vs ceiling |\n"
                "|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {s['sf']} x{s['replicate']} | {s['n_raw_triples']} | {s['sec_local8']} "
            f"| {s['sec_local32']} | {s['triples_per_sec_local8']} "
            f"| {s['triples_per_sec_local32']} | {s['value']} "
            f"| {s['hw_ceiling_efficiency_8_to_32']} "
            f"| {s['efficiency_vs_hw_ceiling']} |\n"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--replicate", type=int, default=100)
    args = ap.parse_args()

    if args.scaling:
        out = run_scaling(args.sf_dir, replicate=args.replicate)
    else:
        out = run_bench(args.sf_dir, args.cpus, args.queries.split(","))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
