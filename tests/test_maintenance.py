"""Unit semantics for episode removal (S11), boilerplate dedup (C4) and
PII scrubbing — tiny hand-built fixtures; the sf-scale behaviour is pinned
by the oracle gate (kg_remove_episode / doc_para_dedup / doc_pii)."""

from __future__ import annotations

import hashlib
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphiti_spark.operators.docs import boilerplate_dedup, pii_scrub
from graphiti_spark.operators.maintenance import remove_episodes_tables


def test_remove_episodes_provenance(spark):
    episodes = spark.createDataFrame([("e1",), ("e2",), ("e3",)], "uuid string")
    edges = spark.createDataFrame(
        [
            ("ed1", ["e1", "e2"]),  # loses e1, survives on e2
            ("ed2", ["e1"]),        # orphaned -> dropped
            ("ed3", ["e3"]),        # untouched
        ],
        "uuid string, episodes array<string>",
    )
    mentions = spark.createDataFrame(
        [("e1", "n1"), ("e2", "n1"), ("e1", "n2"), ("e3", "n3")],
        "episode_uuid string, entity_uuid string",
    )
    nodes = spark.createDataFrame([("n1",), ("n2",), ("n3",)], "uuid string")
    removed = spark.createDataFrame([("e1",)], "uuid string")

    eps, edg, men, nod = remove_episodes_tables(
        episodes, edges, mentions, nodes, removed
    )
    assert sorted(r.uuid for r in eps.collect()) == ["e2", "e3"]
    got = {r.uuid: r.episodes for r in edg.collect()}
    assert got == {"ed1": ["e2"], "ed3": ["e3"]}
    # n2 was mentioned only in e1 -> removed; n1 survives via e2
    assert sorted(r.uuid for r in nod.collect()) == ["n1", "n3"]
    assert men.where(F.col("episode_uuid") == "e1").count() == 0


def test_boilerplate_dedup_removes_cross_url_paragraphs(spark):
    paras = spark.createDataFrame(
        [
            ("u1", 0, "unique one"),
            ("u1", 1, "COPYRIGHT FOOTER"),
            ("u2", 0, "unique two"),
            ("u2", 1, "COPYRIGHT FOOTER"),
            ("u3", 0, "COPYRIGHT FOOTER"),
        ],
        "url string, chunk_idx long, content string",
    )
    out = {r.url: r for r in boilerplate_dedup(paras).collect()}
    assert out["u1"].n_paras == 2 and out["u1"].n_kept == 1
    assert out["u1"].kept_md5 == hashlib.md5(b"unique one").hexdigest()
    # a document that was ALL boilerplate hashes the empty string
    assert out["u3"].n_kept == 0
    assert out["u3"].kept_md5 == hashlib.md5(b"").hexdigest()
    # repeated WITHIN one url but on < min_urls distinct urls is kept
    intra = spark.createDataFrame(
        [("u1", 0, "same"), ("u1", 1, "same")],
        "url string, chunk_idx long, content string",
    )
    row = boilerplate_dedup(intra).collect()[0]
    assert row.n_kept == 2


def test_pii_scrub_counts_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@sub.example.org and 10.1.2.3 plus 555-123-4567"),
            (2, "no pii here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (got[1].n_emails, got[1].n_phones, got[1].n_ips) == (1, 1, 1)
    assert (got[2].n_emails, got[2].n_phones, got[2].n_ips) == (0, 0, 0)
    red = "mail <EMAIL> and <IP> plus <PHONE>"
    assert got[1].redacted_md5 == hashlib.md5(red.encode()).hexdigest()
    assert got[2].redacted_md5 == hashlib.md5(b"no pii here").hexdigest()


def test_integrity_audit_counts(spark):
    from graphiti_spark.operators.maintenance import integrity_audit

    nodes = spark.createDataFrame([("n1",), ("n2",)], "uuid string")
    episodes = spark.createDataFrame([("e1",)], "uuid string")
    edges = spark.createDataFrame(
        [("n1", "n2"), ("n1", "nX"), ("nY", "n2")],
        "source_node_uuid string, target_node_uuid string",
    )
    mentions = spark.createDataFrame(
        [("e1", "n1"), ("e1", "nZ"), ("eQ", "n2")],
        "episode_uuid string, entity_uuid string",
    )
    got = {
        r["check"]: (r["n_bad"], r["n_total"])
        for r in integrity_audit(nodes, edges, mentions, episodes).collect()
    }
    assert got == {
        "edge_src_missing": (1, 3),
        "edge_dst_missing": (1, 3),
        "mention_entity_missing": (1, 3),
        "mention_episode_missing": (1, 3),
    }


def test_functional_violations(spark):
    """A subject with two concurrently-valid objects under a functional
    predicate is reported (sorted object list); invalidated facts and
    non-functional predicates are ignored."""
    from datetime import datetime

    from graphiti_spark.operators.maintenance import functional_violations

    t = datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [
            ("g", "alice", "WORKS_AT", "zcorp", t, None),
            ("g", "alice", "WORKS_AT", "acme", t, None),
            ("g", "bob", "WORKS_AT", "acme", t, None),
            ("g", "bob", "WORKS_AT", "zcorp", t, t),  # invalidated
            ("g", "alice", "VISITED", "rome", t, None),
            ("g", "alice", "VISITED", "paris", t, None),  # not functional
        ],
        "group_id string, subj string, pred string, obj string, "
        "valid_at timestamp, invalid_at timestamp",
    )
    rows = functional_violations(df, ("WORKS_AT", "BASED_IN")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["subj"], r["n_objects"], r["objs"]) == ("alice", 2, "acme,zcorp")


def test_domain_range_violations(spark):
    from graphiti_spark.operators.maintenance import domain_range_violations

    triples = spark.createDataFrame(
        [
            ("g", "Ann", "WORKS_AT", "Acme"),     # clean
            ("g", "Acme", "WORKS_AT", "Ann"),     # both sides wrong
            ("g", "Ann", "MOVED_TO", "Dublin"),   # clean
            ("g", "Ann", "MOVED_TO", "Acme"),     # range violation
            ("g", "Ann", "CUSTOM_PRED", "Acme"),  # unconstrained: never flags
            ("g", "Ghost", "LIKES", "Ann"),       # missing subject node
        ],
        "group_id string, subj string, pred string, obj string",
    )
    labels = spark.createDataFrame(
        [
            ("g", "Ann", ["Person"]),
            ("g", "Acme", ["Organization"]),
            ("g", "Dublin", ["Place"]),
        ],
        "group_id string, name string, labels array<string>",
    )
    rows = {
        r["pred"]: r.asDict()
        for r in domain_range_violations(triples, labels).collect()
    }
    assert rows["WORKS_AT"]["n_edges"] == 2
    assert rows["WORKS_AT"]["n_subj_viol"] == 1
    assert rows["WORKS_AT"]["n_obj_viol"] == 1
    assert rows["MOVED_TO"]["n_subj_viol"] == 0
    assert rows["MOVED_TO"]["n_obj_viol"] == 1
    assert rows["CUSTOM_PRED"]["n_subj_viol"] == 0
    assert rows["CUSTOM_PRED"]["n_obj_viol"] == 0
    assert rows["LIKES"]["n_subj_viol"] == 1  # missing node = violation
