"""Pages source: the Common-Crawl-style input table (url, warc_ts, html,
text, lang) per BASELINE.json input_hint.

At production scale this table is simply `spark.read.table('pages')` /
`spark.read.parquet(...)` over the crawl dump, partitioned by domain
(group_id). For tests and benchmarks we *synthesize* it deterministically
from the driver-provided documents.parquet via a fully vectorized
numpy/pandas builder inside `mapInPandas` (Arrow-batched; no per-row
Python). The same content is reproducible by `corpus.golden_pages`
(pytest oracle) and by `corpus.sql_pages_cte()` (DuckDB oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .. import corpus
from ..schemas import PAGES


def synth_pages_pdf(docs: pd.DataFrame) -> pd.DataFrame:
    """Vectorized page synthesis for one Arrow batch of documents rows."""
    d = docs["doc_id"].to_numpy(np.int64)
    n = len(d)
    if n == 0:
        return pd.DataFrame(
            {c: pd.Series(dtype=o) for c, o in
             [("url", object), ("warc_ts", "datetime64[us]"), ("html", object),
              ("text", object), ("lang", object), ("group_id", object),
              ("doc_id", np.int64)]}
        )
    nsent = 3 + d % 4
    doc_idx = np.repeat(np.arange(n), nsent)
    k = np.arange(int(nsent.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(nsent) - nsent, nsent
    )
    dd = d[doc_idx]

    t = (dd * 3 + k * 5) % corpus.N_TEMPLATES
    persons = np.array(corpus.PERSONS, dtype=object)
    orgs = np.array(corpus.ORGS, dtype=object)
    places = np.array(corpus.PLACES, dtype=object)
    pi = ((dd * 7 + k * 13) // 2) % len(persons)
    person = persons[pi]
    person2 = persons[(pi + 1 + dd % 3) % len(persons)]
    org = orgs[(pi * 3 + dd % 2) % len(orgs)]
    place = places[(dd * 5 + k * 7) % len(places)]
    year = (2015 + (dd + k) % 9).astype(str).astype(object)
    date_iso = pd.Series(
        np.datetime64(corpus.EPOCH.strftime("%Y-%m-%d"))
        + ((dd * 13 + k * 29) % 365).astype("timedelta64[D]")
    ).dt.strftime("%Y-%m-%d").to_numpy(dtype=object)
    honor = (dd + 3 * k) % 7 == 0
    org_inc = (dd + 2 * k) % 5 == 0
    pdisp = np.where(honor, corpus.HONORIFIC + person, person).astype(object)
    odisp = np.where(org_inc, org + corpus.ORG_SUFFIX, org).astype(object)

    sentence = np.select(
        [t == 0, t == 1, t == 2, t == 3, t == 4, t == 5, t == 6],
        [
            pdisp + " works at " + odisp + ".",
            pdisp + " no longer works at " + odisp + ".",
            pdisp + " likes " + person2 + ".",
            pdisp + " dislikes " + person2 + ".",
            odisp + " is based in " + place + ".",
            pdisp + " moved to " + place + ".",
            "Since " + year + ", " + pdisp + " has led " + odisp + ".",
        ],
        default=pdisp + " visited " + place + " on " + date_iso + ".",
    )

    sent_df = pd.DataFrame({"i": doc_idx, "pk": k // 2, "s": sentence})
    paras = sent_df.groupby(["i", "pk"], sort=True)["s"].agg(" ".join)
    body = paras.groupby(level=0).agg("\n\n".join)  # aligned to doc order

    src = docs["source"].to_numpy(dtype=object)
    title = pd.Series(
        "web digest " + pd.Series(d).astype(str) + " - " + src + " daily notes",
        dtype=object,
    )
    title = title.where(pd.Series(d % 3 != 0), title + corpus.ZWSP)
    noise = docs["text"].astype(str).str.slice(0, 120).to_numpy(dtype=object)
    text = title.to_numpy(dtype=object) + "\n\n" + noise + "\n\n" + body.to_numpy(dtype=object)

    html = (
        "<html><body><p>"
        + pd.Series(text, dtype=object).str.replace("\n\n", "</p><p>", regex=False)
        + "</p></body></html>"
    ).str.encode("utf-8")

    warc_ts = pd.Series(
        np.datetime64(corpus.EPOCH.strftime("%Y-%m-%dT%H:%M:%S"))
        + (d * corpus.WARC_STEP_MINUTES).astype("timedelta64[m]")
    )
    return pd.DataFrame(
        {
            "url": "https://" + src + ".example.com/doc/" + pd.Series(d).astype(str).to_numpy(dtype=object),
            "warc_ts": warc_ts,
            "html": html,
            "text": text,
            "lang": docs["lang"].to_numpy(dtype=object),
            "group_id": src,
            "doc_id": d,
        }
    )


def build_pages(
    spark: SparkSession,
    sf_dir: str,
    replicate: int = 1,
    partitions: int | None = None,
    with_html: bool = True,
) -> DataFrame:
    """documents.parquet -> pages DataFrame (Arrow-batched synthesis).

    The driver testdata is a single small parquet file (1 input split), so
    we explicitly repartition before the Python stage — otherwise the whole
    extraction chain would run in one task regardless of cluster size. At
    real crawl scale the source table arrives pre-partitioned by
    domain/crawl-segment and this repartition is unnecessary.

    ``replicate`` deterministically scales the corpus for benchmarks: page
    d of replica r becomes page ``doc_id * replicate + r`` (a pure function
    of the input — replicate=1 is the identity, used by all correctness
    paths).
    """
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    # Natively-partitioned id space + broadcast of the (small) base table:
    # no shuffle at all — spark.range supplies the partitioning, the base
    # docs ride the broadcast. (A plain .repartition() would shuffle the
    # full replicated text through the exchange.)
    from pyspark.sql import functions as F

    n_docs = base.count()
    n_parts = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(n_docs * replicate, numPartitions=n_parts)
    docs = (
        ids.select(
            F.col("id").alias("doc_id"),
            F.expr(f"id div {replicate}").alias("base_doc_id"),
        )
        .join(
            F.broadcast(base.withColumnRenamed("doc_id", "base_doc_id")),
            "base_doc_id",
        )
        .select("doc_id", "text", "lang", "source")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = synth_pages_pdf(pdf)
            if not with_html:
                # html is only consumed by the text-null fallback; skipping
                # it halves the Arrow transfer out of the Python stage
                out["html"] = None
            yield out

    return docs.mapInPandas(gen, schema=PAGES)
