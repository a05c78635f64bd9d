"""The north-rule per-row invariant: byte-identical extracted/cleaned text
per url across three independent implementations — the Spark source +
clean stage, the single-process pandas golden generator, and the DuckDB
SQL oracle."""

from __future__ import annotations

import duckdb
import pandas as pd

from graphiti_spark import corpus
from graphiti_spark.functions.text import clean_text
from graphiti_spark.operators.episodes import clean_pages
from graphiti_spark.sources.pages import build_pages


def test_spark_pages_match_golden_bytes(spark, sf_dir, docs_pdf):
    golden = corpus.golden_pages(docs_pdf).set_index("url")
    got = build_pages(spark, sf_dir).toPandas().set_index("url")
    assert sorted(got.index) == sorted(golden.index)
    g = golden.loc[got.index]
    assert (got["text"].to_numpy() == g["text"].to_numpy()).all()
    assert (got["html"].map(bytes).to_numpy() == g["html"].map(bytes).to_numpy()).all()
    assert (
        pd.to_datetime(got["warc_ts"]).to_numpy() == pd.to_datetime(g["warc_ts"]).to_numpy()
    ).all()


def test_cleaned_text_matches_sql_oracle(spark, sf_dir, docs_pdf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = con.execute(
        "WITH " + corpus.sql_pages_cte().lstrip()
        + "\nSELECT url, clean_text FROM pages_g"
    ).df().set_index("url")

    cleaned = (
        clean_pages(build_pages(spark, sf_dir))
        .select("url", "text_clean")
        .toPandas()
        .set_index("url")
    )
    o = oracle.loc[cleaned.index]
    assert (cleaned["text_clean"].to_numpy() == o["clean_text"].to_numpy()).all()


def test_clean_is_python_clean_text(docs_pdf):
    """The Spark regex clean and the pure-python reference-parity clean
    agree on every synthesized page."""
    pages = corpus.golden_pages(docs_pdf)
    for t in pages["text"].head(50):
        c = clean_text(t)
        assert corpus.ZWSP not in c
        assert c == t.replace(corpus.ZWSP, "")


def test_html_fallback_roundtrip(spark, sf_dir):
    """Pages with text=NULL fall back to stripping html; paragraph
    boundaries survive."""
    pages = build_pages(spark, sf_dir).limit(20)
    import pyspark.sql.functions as F

    no_text = pages.withColumn("text", F.lit(None).cast("string"))
    a = clean_pages(pages).select("url", "text_clean").toPandas().set_index("url")
    b = clean_pages(no_text).select("url", "text_clean").toPandas().set_index("url")
    b = b.loc[a.index]
    assert (a["text_clean"].to_numpy() == b["text_clean"].to_numpy()).all()
