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
    for name in names:
        registry._GRAPH_CACHE.clear()  # no cross-query reuse: honest per-query cost
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
    }
    if "kg_triples" in timings and timings["kg_triples"] > 0:
        out["triples_per_sec"] = round(n_triples / timings["kg_triples"], 1)
    spark.stop()
    return out


def run_scaling(sf_dir: str) -> dict:
    """Same flagship job at local[8] vs local[32] in fresh subprocesses."""
    results = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [
                sys.executable, __file__, "--sf-dir", sf_dir, "--cpus", str(cpus),
                "--queries", "kg_triples",
            ],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["queries"]["kg_triples"]
    t32 = results[32]["queries"]["kg_triples"]
    n = results[32]["n_triples"]
    eff = round((t8 / t32) / 4, 3)
    summary = {
        "metric": "kg_construct_scaling_efficiency_8_to_32",
        "value": eff,
        "unit": "ratio",
        "sf": sf_dir,
        "n_triples": n,
        "sec_local8": t8,
        "sec_local32": t32,
        "triples_per_sec_local8": round(n / t8, 1),
        "triples_per_sec_local32": round(n / t32, 1),
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
                "| sf_dir | n_triples | sec local[8] | sec local[32] | tps local[8] "
                "| tps local[32] | efficiency |\n|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {s['sf']} | {s['n_triples']} | {s['sec_local8']} | {s['sec_local32']} "
            f"| {s['triples_per_sec_local8']} | {s['triples_per_sec_local32']} "
            f"| {s['value']} |\n"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        out = run_scaling(args.sf_dir)
    else:
        out = run_bench(args.sf_dir, args.cpus, args.queries.split(","))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
