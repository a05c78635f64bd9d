"""Three-way parity for the X5 normalization key: the Python reference
(`normalize_entity_name`), the Spark SQL expression (`norm_sql(duck=False)`),
and the DuckDB oracle expression (`norm_sql(duck=True)`) must agree on every
single-spaced name — the precondition under which the blocking key, the
global entity rollup (kg_global_entities) and the fact fusion
(kg_global_triples) apply it."""

from __future__ import annotations

import duckdb
import pandas as pd

from graphiti_spark.functions.text import normalize_entity_name
from graphiti_spark.operators.extract import norm_sql

# honorifics x suffix repeats x case x single-token edge cases
NAMES = [
    "Alice Johnson",
    "Professor Alice Johnson",
    "Dr. Bob Stone",
    "Dr Bob Stone",
    "Mr. X",
    "Ms. Y Z",
    "Mrs. Carol Mendes",
    "Acme Corp Inc",
    "Acme Inc Ltd",
    "Acme Inc Inc",
    "Globex LLC",
    "Inc",
    "inc",
    "Ltd Inc",
    "Dr. Inc",
    "Professor LLC",
    "dr. dr smith",
    "DRAKE HALL",          # 'dr' prefix must require the trailing space
    "Mrsmith Jones",       # 'mrs' prefix must require the dot+space form
    "professor",           # honorific alone: prefix regex needs the space
    "Jose-Maria O'Neill",  # punctuation passes through
    "Acme  Corp",          # double space: NOT collapsed by SQL; Python
                           # collapses — excluded from parity, see below
]
SINGLE_SPACED = [n for n in NAMES if "  " not in n]


def test_python_spark_duck_norm_parity(spark):
    pdf = pd.DataFrame({"name": SINGLE_SPACED})
    got_spark = (
        spark.createDataFrame(pdf)
        .selectExpr(f"{norm_sql('name')} AS k")
        .toPandas()["k"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {norm_sql('name', duck=True)} FROM t"
        ).fetchall()
    ]
    got_py = [normalize_entity_name(n) for n in SINGLE_SPACED]
    assert got_spark == got_py
    assert got_duck == got_py


def test_norm_whitespace_precondition_documented():
    # the known, intentional divergence: SQL does not collapse internal
    # whitespace (canonical names are single-spaced by construction);
    # the Python reference does. Pin the divergence so a future corpus
    # change that introduces double spaces fails loudly here.
    assert normalize_entity_name("Acme  Corp") == "acme corp"
    con = duckdb.connect()
    got = con.execute(
        "SELECT " + norm_sql("'Acme  Corp'", duck=True)
    ).fetchone()[0]
    assert got == "acme  corp"
