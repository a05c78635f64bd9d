"""Bulk randomized invariant tests for the graph-analytics and event
operators: one seeded random input, one Spark job per operator, every
case cross-checked against an independent pure-Python brute force."""

from __future__ import annotations

import datetime as dt
import itertools

import numpy as np

from graphiti_spark.operators.centrality import (
    clustering_coefficients,
    link_prediction,
)
from graphiti_spark.operators.events import SESSION_GAP_US, sessionize

RNG = np.random.RandomState(7)
NAMES = [f"n{i:02d}" for i in range(18)]


def _random_graph():
    pairs = sorted(
        {
            (NAMES[a], NAMES[b]) if NAMES[a] < NAMES[b] else (NAMES[b], NAMES[a])
            for a, b in RNG.randint(0, len(NAMES), size=(60, 2))
            if a != b
        }
    )
    return pairs


def _spark_triples(spark, pairs):
    return spark.createDataFrame(
        [("g", s, "REL", o) for s, o in pairs],
        "group_id string, subj string, pred string, obj string",
    )


def test_clustering_matches_brute_force(spark):
    pairs = _random_graph()
    adj: dict[str, set[str]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {
        r["name"]: r.asDict()
        for r in clustering_coefficients(_spark_triples(spark, pairs)).collect()
    }
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1 for x, y in itertools.combinations(sorted(nbrs), 2) if y in adj[x]
        )
        assert got[v]["degree"] == deg
        assert got[v]["triangles"] == tri
        want_u = (2_000_000 * tri) // (deg * (deg - 1)) if deg >= 2 else 0
        assert got[v]["coeff_u"] == want_u
        assert 0 <= got[v]["coeff_u"] <= 1_000_000


def test_link_prediction_matches_brute_force(spark):
    pairs = _random_graph()
    adj: dict[str, set[str]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        if b in adj[a]:
            continue
        common = len(adj[a] & adj[b])
        if common:
            union = len(adj[a]) + len(adj[b]) - common
            want[(a, b)] = (common, (1_000_000 * common) // union)
    got = {
        (r["name_a"], r["name_b"]): (r["common"], r["jaccard_u"])
        for r in link_prediction(_spark_triples(spark, pairs)).collect()
    }
    assert got == want


def test_sessionize_invariants_random_events(spark):
    t0 = dt.datetime(2024, 3, 1)
    rows, counts = [], {}
    eid = 0
    for uid in range(12):
        n = int(RNG.randint(1, 25))
        counts[uid] = n
        offsets = np.cumsum(RNG.randint(0, 90, size=n))  # minutes, dups ok
        for off in offsets:
            rows.append(
                (eid, t0 + dt.timedelta(minutes=int(off)), uid, "view", 1.0, "{}")
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    out = sessionize(events).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(counts)
    gap = dt.timedelta(microseconds=SESSION_GAP_US)
    for uid, sess in by_user.items():
        sess.sort(key=lambda r: r["session_idx"])
        # every event lands in exactly one session
        assert sum(r["n_events"] for r in sess) == counts[uid]
        assert [r["session_idx"] for r in sess] == list(range(len(sess)))
        for r in sess:
            assert r["session_start"] <= r["session_end"]
        # consecutive sessions are separated by MORE than the gap
        for prev, nxt in zip(sess, sess[1:]):
            assert nxt["session_start"] - prev["session_end"] > gap


def test_funnel_and_retention_invariants_random_events(spark):
    from graphiti_spark.operators.events import funnel, retention

    t0 = dt.datetime(2024, 5, 1)
    types = ["view", "click", "purchase"]
    rows = []
    eid = 0
    for uid in range(30):
        for _ in range(int(RNG.randint(1, 15))):
            rows.append(
                (
                    eid,
                    t0 + dt.timedelta(minutes=int(RNG.randint(0, 60 * 24 * 5))),
                    uid,
                    types[RNG.randint(0, 3)],
                    1.0,
                    "{}",
                )
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    fun = funnel(events, types).collect()
    viewers = {r[2] for r in rows if r[3] == "view"}
    assert {r["user_id"] for r in fun} == viewers
    for r in fun:
        ts = [r["t1"], r["t2"], r["t3"]]
        # once the funnel breaks it stays broken; present steps are
        # strictly increasing in time
        present = [t is not None for t in ts]
        assert present == sorted(present, reverse=True)
        got_steps = sum(present)
        assert r["steps_completed"] == got_steps
        for a, b in zip(ts, ts[1:]):
            if b is not None:
                assert b > a
    ret = retention(events).collect()
    by_cohort: dict = {}
    for r in ret:
        by_cohort.setdefault(r["cohort_day"], {})[r["day_offset"]] = r
    for cohort, offs in by_cohort.items():
        # every user is active on their first day: offset-0 row is exact
        assert offs[0]["n_users"] == offs[0]["cohort_size"]
        assert offs[0]["retention_u"] == 1_000_000
        for r in offs.values():
            assert 0 < r["n_users"] <= r["cohort_size"]
            assert 0 < r["retention_u"] <= 1_000_000
            assert r["day_offset"] >= 0
