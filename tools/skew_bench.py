"""Adversarial-skew benchmark: run the flagship KG-construction DAG on
the uniform sf0.1 corpus and on the hot-domain fixture
(tools/make_skew_fixture.py), with the Spark event log on, and compare

1. wall time (skew must not collapse throughput), and
2. per-stage straggler ratio max_task_ms / median_task_ms for every
   stage whose max task exceeds 1s (the north rule's skew criterion:
   a hot key that defeats the caps/AQE shows up as one 10x-straggler
   task dragging a stage).

Each corpus runs in a FRESH subprocess (own SparkSession, own event-log
dir) so JIT/cache state cannot favor either side. Appends a summary
section to BENCH.md and prints one JSON line.

Usage: python tools/skew_bench.py [uniform_dir] [skew_dir] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_SNIPPET = """
import glob, json, os, sys, time
sf_dir, evdir, R = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(evdir, exist_ok=True)
os.environ["SPARK_GRAFT_EVENTLOG"] = evdir
from graphiti_spark.session import get_spark
spark = get_spark(app_name="skewbench")
spark.sparkContext.setLogLevel("ERROR")
from graphiti_spark.plans.pipeline import build_graph, triples_view
# warm-up (JIT, python workers) on the tiny corpus, then timed runs
t = build_graph(spark, "/root/testdata/sf0.001")
triples_view(t).count()
spark.catalog.clearCache()
times = []
for _ in range(2):
    t0 = time.perf_counter()
    t = build_graph(spark, sf_dir, replicate=R)
    n = triples_view(t).count()
    times.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
n_raw = t.triples_raw.count()
spark.stop()
# parse the event log (Spark 4: rolling eventlog_v2_* DIRECTORIES):
# per-stage task durations
stages = {}
paths = [os.path.join(r, f) for r, _, fs in os.walk(evdir) for f in fs
         if not f.startswith("appstatus")]
for path in paths:
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                stages.setdefault(sid, []).append(dur)
worst = []
for sid, durs in stages.items():
    durs.sort()
    mx = durs[-1]
    med = durs[len(durs) // 2] or 1
    if mx > 1000:
        worst.append({"stage": sid, "n_tasks": len(durs), "max_ms": mx,
                      "median_ms": med, "ratio": round(mx / med, 2)})
worst.sort(key=lambda w: -w["ratio"])
print(json.dumps({"sf_dir": sf_dir, "times": times, "sec": min(times),
                  "n_canonical": n, "n_raw": n_raw,
                  "worst_stages": worst[:8]}))
"""


def run_one(sf_dir: str, replicate: int, tag: str) -> dict:
    evdir = f"/tmp/skewbench-events-{tag}"
    __import__("shutil").rmtree(evdir, ignore_errors=True)
    # event logging must be set before the session exists -> subprocess
    env = {**os.environ, "SPARK_GRAFT_EVENTLOG": evdir}
    proc = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET, sf_dir, evdir, str(replicate)],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"skewbench subprocess failed:\n{proc.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    uniform = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skew = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "fixtures/skew0.1")
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    if not os.path.exists(os.path.join(skew, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/make_skew_fixture.py"),
             uniform, skew], check=True, cwd=REPO,
        )
    u = run_one(uniform, replicate, "uniform")
    s = run_one(skew, replicate, "skew")
    ratio = round(s["sec"] / u["sec"], 3)
    max_straggler = max(
        [w["ratio"] for w in s["worst_stages"]] or [1.0]
    )
    out = {
        "metric": "skew_vs_uniform_flagship_wall_ratio",
        "value": ratio,
        "unit": "ratio",
        "replicate": replicate,
        "uniform": u,
        "skew": s,
        "max_straggler_ratio_skew": max_straggler,
    }
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Adversarial skew (hot domain 45%+, hot entities) — "
            f"x{replicate}\n\n"
            f"| corpus | sec (min of 2) | raw triples | canonical |\n"
            f"|---|---|---|---|\n"
            f"| {uniform} (uniform) | {u['sec']} | {u['n_raw']} | {u['n_canonical']} |\n"
            f"| {skew} (skewed) | {s['sec']} | {s['n_raw']} | {s['n_canonical']} |\n\n"
            f"wall ratio skew/uniform = {ratio}; worst per-stage "
            f"max/median task-time on the skewed run = {max_straggler} "
            f"(stages with max task > 1s; 10x = a straggler the caps/AQE "
            f"failed to split). worst stages: "
            f"{json.dumps(s['worst_stages'][:3])}\n"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
