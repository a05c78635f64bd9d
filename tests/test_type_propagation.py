"""Clamped-seed label propagation (communities.propagate_labels): the
driver gates the masked-eval query via the `kg_type_propagation`
oracle; these pin the propagation semantics on hand graphs."""

from __future__ import annotations

from graphiti_spark.operators.communities import propagate_labels


def _run(spark, edges, seeds, rounds=3):
    e = spark.createDataFrame(
        edges, "source_node_uuid string, target_node_uuid string"
    )
    s = spark.createDataFrame(seeds, "uuid string, label string")
    out = propagate_labels(e, s, rounds=rounds).collect()
    return {r["uuid"]: r["label"] for r in out}


def test_majority_and_tiebreak(spark):
    """Hub with 2 Person + 1 Org neighbors -> Person; 1-1 tie breaks
    to the lexicographically smaller label."""
    got = _run(
        spark,
        [("hub", "p1"), ("hub", "p2"), ("hub", "o1")],
        [("hub", None), ("p1", "Person"), ("p2", "Person"), ("o1", "Org")],
    )
    assert got["hub"] == "Person"
    got2 = _run(
        spark,
        [("hub", "p1"), ("hub", "o1")],
        [("hub", None), ("p1", "Person"), ("o1", "Org")],
    )
    assert got2["hub"] == "Org"  # 'Org' < 'Person'


def test_multi_hop_and_clamping(spark):
    """Chain seed(P)-x-y: x labels in round 1, y in round 2 (newly
    labeled nodes vote); the seed itself never changes even with a
    differently-labeled neighbor."""
    got = _run(
        spark,
        [("seed", "x"), ("x", "y"), ("seed", "other")],
        [("seed", "Person"), ("x", None), ("y", None), ("other", "Org")],
        rounds=2,
    )
    assert got == {"seed": "Person", "x": "Person", "y": "Person",
                   "other": "Org"}


def test_isolated_stays_unlabeled(spark):
    got = _run(
        spark,
        [("a", "b")],
        [("a", "Person"), ("b", None), ("island", None)],
    )
    assert got["b"] == "Person" and got["island"] is None
