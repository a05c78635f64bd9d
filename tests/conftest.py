from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# oracle SQL builders resolve shared scratch-parquet paths (similarity /
# MMR / edge-dedup embeddings) from this env var; it must agree with the
# scale the Spark side runs at, exactly as tools/check_correctness.py sets
# it before building oracles
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR


@pytest.fixture(scope="session")
def spark():
    from graphiti_spark.session import get_spark

    s = get_spark(app_name="graphiti-spark-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def docs_pdf(sf_dir) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="session")
def graph(spark, sf_dir):
    from graphiti_spark.plans.pipeline import build_graph

    return build_graph(spark, sf_dir)
