"""Incremental merge job (jobs/incremental_merge_job.py): persisted
state round-trips through parquet and a merge resumed FROM DISK equals
the one-shot batch build — the cross-job-restart form of the
incremental == batch contract."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

from graphiti_spark.plans import incremental
from graphiti_spark.sources.pages import build_pages

_SPEC = importlib.util.spec_from_file_location(
    "incremental_merge_job",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "jobs", "incremental_merge_job.py"),
)
_JOB = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_JOB)


def test_state_roundtrip_resume(spark, sf_dir, tmp_path):
    pages = build_pages(spark, sf_dir)
    even = pages.where(F.col("doc_id") % 2 == 0)
    odd = pages.where(F.col("doc_id") % 2 == 1)
    root = str(tmp_path / "state")

    st = incremental.initial_state(even)
    _JOB.save_state(st, root)

    # a fresh process would reload from parquet — simulate it
    st2 = _JOB.load_state(spark, root)
    assert st2 is not None
    merged = incremental.merge_batch(st2, odd)
    _JOB.save_state(merged, root)

    cols = ["group_id", "subj", "pred", "obj", "fact", "valid_at",
            "invalid_at", "n_episodes"]
    resumed = (
        incremental.incremental_triples(_JOB.load_state(spark, root))
        .toPandas()[cols].sort_values(cols[:6]).reset_index(drop=True)
    )
    oneshot = (
        incremental.incremental_triples(incremental.initial_state(pages))
        .toPandas()[cols].sort_values(cols[:6]).reset_index(drop=True)
    )
    assert resumed.equals(oneshot)


def test_empty_state_is_bootstrap(spark, tmp_path):
    assert _JOB.load_state(spark, str(tmp_path / "nope")) is None
