"""Deterministic, vectorized mention detection (X1/X2) and triple
extraction (X3) — the replacement for graphiti's per-episode LLM calls.

Reference decision structure mirrored:
- extract_nodes: entity-name list per episode, "full explicit names", no
  relation/temporal nodes (/root/reference/graphiti_core/utils/maintenance/
  node_operations.py:40-212; prompts/extract_nodes.py:63-140).
- extract_edges: triples only between extracted entities, relation name
  ALL-CAPS, natural-language fact sentence, episodes=[episode.uuid]
  (utils/maintenance/edge_operations.py:73-148; prompts/extract_edges.py:50-110).
- extract_edge_dates: valid_at resolved relative to the episode's
  reference timestamp (= warc_ts for crawl pages); explicit years/dates in
  the fact override; ISO-8601 (utils/maintenance/temporal_operations.py:32-68;
  prompts/extract_edge_dates.py:43-87).

Everything is pandas-vectorized (str.extract / str.findall across the
whole Arrow batch) inside mapInPandas — no row-at-a-time Python UDFs.
The same functions run single-process in the pytest golden oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.text import strip_honorific
from ..schemas import MENTIONS_RAW, TRIPLES_RAW

NAME = r"(?:Professor |Dr\. )?[A-Z][a-z]+(?: [A-Z][a-z]+)*"
NAME_G = f"({NAME})"
SPAN_RE = NAME
SENT_SPLIT = r"(?<=\.)\s+"

# sentence-initial function words a capitalized-span detector must drop
STOP_SPANS = frozenset(
    {"Since", "The", "A", "An", "On", "In", "At", "By", "From", "To", "He",
     "She", "They", "It", "We", "However", "Meanwhile", "January", "February",
     "March", "April", "May", "June", "July", "August", "September",
     "October", "November", "December"}
)

# (template_id, compiled pattern, predicate) — order matters: the negated
# form must be tried before its positive substring twin.
_PATTERNS: list[tuple[int, str, str]] = [
    (1, rf"^{NAME_G} no longer works at {NAME_G}\.$", "NO_LONGER_WORKS_AT"),
    (0, rf"^{NAME_G} works at {NAME_G}\.$", "WORKS_AT"),
    (2, rf"^{NAME_G} likes {NAME_G}\.$", "LIKES"),
    (3, rf"^{NAME_G} dislikes {NAME_G}\.$", "DISLIKES"),
    (4, rf"^{NAME_G} is based in {NAME_G}\.$", "BASED_IN"),
    (5, rf"^{NAME_G} moved to {NAME_G}\.$", "MOVED_TO"),
    (6, rf"^Since (\d{{4}}), {NAME_G} has led {NAME_G}\.$", "LEADS"),
    (7, rf"^{NAME_G} visited {NAME_G} on (\d{{4}}-\d{{2}}-\d{{2}})\.$", "VISITED"),
]

PRED_ROLES = {
    "WORKS_AT": ("Person", "Organization"),
    "NO_LONGER_WORKS_AT": ("Person", "Organization"),
    "LIKES": ("Person", "Person"),
    "DISLIKES": ("Person", "Person"),
    "BASED_IN": ("Organization", "Place"),
    "MOVED_TO": ("Person", "Place"),
    "LEADS": ("Person", "Organization"),
    "VISITED": ("Person", "Place"),
}


def _explode_sentences(pdf: pd.DataFrame) -> pd.DataFrame:
    s = pdf[["uuid", "group_id", "content", "valid_at"]].rename(
        columns={"uuid": "episode_uuid"}
    )
    s = s.assign(sentence=s["content"].str.split(SENT_SPLIT)).explode("sentence")
    s = s[s["sentence"].notna() & (s["sentence"] != "")]
    s = s.reset_index(drop=True)
    s["sent_idx"] = s.groupby("episode_uuid").cumcount().astype(np.int32)
    return s.drop(columns=["content"])


def extract_triples_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Episodes batch -> raw triples. Vectorized: one str.extract per
    pattern over all sentences of the batch."""
    s = _explode_sentences(pdf)
    if len(s) == 0:
        return pd.DataFrame(
            {
                "episode_uuid": pd.Series(dtype=object),
                "group_id": pd.Series(dtype=object),
                "sent_idx": pd.Series(dtype=np.int32),
                "subj_name": pd.Series(dtype=object),
                "pred": pd.Series(dtype=object),
                "obj_name": pd.Series(dtype=object),
                "fact": pd.Series(dtype=object),
                "valid_at": pd.Series(dtype="datetime64[us]"),
                "invalid_at": pd.Series(dtype="datetime64[us]"),
                "warc_ts": pd.Series(dtype="datetime64[us]"),
            }
        )

    sent = s["sentence"]
    n = len(s)
    subj = pd.Series([None] * n, dtype=object)
    obj = pd.Series([None] * n, dtype=object)
    pred = pd.Series([None] * n, dtype=object)
    explicit_valid = pd.Series([pd.NaT] * n, dtype="datetime64[us]")
    matched = np.zeros(n, dtype=bool)

    for t, pat, name in _PATTERNS:
        ex = sent.str.extract(pat)
        if t == 6:
            hit = ex[0].notna() & ~matched
            if hit.any():
                subj[hit] = ex.loc[hit, 1]
                obj[hit] = ex.loc[hit, 2]
                explicit_valid[hit] = pd.to_datetime(
                    ex.loc[hit, 0] + "-01-01", format="%Y-%m-%d"
                )
        elif t == 7:
            hit = ex[0].notna() & ~matched
            if hit.any():
                subj[hit] = ex.loc[hit, 0]
                obj[hit] = ex.loc[hit, 1]
                explicit_valid[hit] = pd.to_datetime(ex.loc[hit, 2], format="%Y-%m-%d")
        else:
            hit = ex[0].notna() & ~matched
            if hit.any():
                subj[hit] = ex.loc[hit, 0]
                obj[hit] = ex.loc[hit, 1]
        pred[hit.to_numpy()] = name
        matched |= hit.to_numpy()

    out = s.loc[matched, ["episode_uuid", "group_id", "sent_idx", "valid_at"]].copy()
    out = out.rename(columns={"valid_at": "warc_ts"})
    out["subj_name"] = (
        subj[matched].str.replace(r"^(?:Professor |Dr\. )", "", regex=True)
    )
    out["pred"] = pred[matched]
    out["obj_name"] = (
        obj[matched].str.replace(r"^(?:Professor |Dr\. )", "", regex=True)
    )
    out["fact"] = sent[matched]
    ev = explicit_valid[matched]
    out["valid_at"] = ev.where(ev.notna(), out["warc_ts"])
    out["invalid_at"] = pd.Series(pd.NaT, index=out.index, dtype="datetime64[us]")
    return out[
        [
            "episode_uuid", "group_id", "sent_idx", "subj_name", "pred",
            "obj_name", "fact", "valid_at", "invalid_at", "warc_ts",
        ]
    ].reset_index(drop=True)


def extract_mentions_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Capitalized-span mention detector (X1) + role-vote typing (X2).

    Spans come from str.findall over the batch; labels are voted from the
    predicate roles of the triples the mention participates in (unanimous
    on template corpora; plurality with label-name tie-break otherwise).
    """
    trip = extract_triples_pdf(pdf)
    s = _explode_sentences(pdf)
    spans = s.assign(span=s["sentence"].str.findall(SPAN_RE)).explode("span")
    spans = spans[spans["span"].notna()]
    spans["name"] = spans["span"].map(strip_honorific)
    spans = spans[~spans["name"].isin(STOP_SPANS)]

    if len(trip):
        roles = pd.concat(
            [
                trip.assign(
                    name=trip["subj_name"],
                    label=trip["pred"].map(lambda p: PRED_ROLES[p][0]),
                )[["episode_uuid", "name", "label"]],
                trip.assign(
                    name=trip["obj_name"],
                    label=trip["pred"].map(lambda p: PRED_ROLES[p][1]),
                )[["episode_uuid", "name", "label"]],
            ]
        )
        votes = (
            roles.groupby(["name", "label"]).size().rename("n").reset_index()
            .sort_values(["name", "n", "label"], ascending=[True, False, True])
            .drop_duplicates("name")[["name", "label"]]
        )
    else:
        votes = pd.DataFrame({"name": pd.Series(dtype=object), "label": pd.Series(dtype=object)})

    from ..functions.text import normalize_entity_name

    out = spans[["episode_uuid", "group_id", "name", "valid_at"]].drop_duplicates(
        ["episode_uuid", "name"]
    )
    out = out.merge(votes, on="name", how="left")
    out["label"] = out["label"].fillna("Entity")
    out["norm_name"] = out["name"].map(normalize_entity_name)
    return out[
        ["episode_uuid", "group_id", "name", "norm_name", "label", "valid_at"]
    ].reset_index(drop=True)


UNION_SCHEMA = (
    "kind string, episode_uuid string, group_id string, sent_idx int,"
    " subj_name string, pred string, obj_name string, fact string,"
    " valid_at timestamp, invalid_at timestamp, warc_ts timestamp,"
    " name string, norm_name string"
)


def extract_all_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """One pass per batch emitting a union of extraction outputs:
    kind='t' triple rows (X3/X4) and kind='m' mention rows (X1).
    Splitting sentences and shipping episode content over Arrow happens
    once instead of once per extractor."""
    trip = extract_triples_pdf(pdf)
    ment = extract_spans_pdf(pdf)
    trip = trip.assign(kind="t", name=None, norm_name=None)
    ment = ment.assign(
        kind="m", sent_idx=np.int32(0), subj_name=None, pred=None, obj_name=None,
        fact=None, invalid_at=pd.NaT, warc_ts=pd.NaT,
    )
    cols = [
        "kind", "episode_uuid", "group_id", "sent_idx", "subj_name", "pred",
        "obj_name", "fact", "valid_at", "invalid_at", "warc_ts", "name",
        "norm_name",
    ]
    return pd.concat([trip[cols], ment[cols]], ignore_index=True)


def extract_all(episodes: DataFrame) -> DataFrame:
    """Single-pass extraction stage. Downstream: filter kind='t' for
    triples, kind='m' for mentions. Persist/materialize this output —
    it is the skinny fan-out point of the whole pipeline (no page/episode
    content strings)."""
    cols = episodes.select("uuid", "group_id", "content", "valid_at")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_all_pdf(pdf)

    return cols.mapInPandas(gen, schema=UNION_SCHEMA)


def split_extracted(all_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(triples_raw, mentions_raw-without-labels) views of extract_all."""
    triples = all_df.where(F.col("kind") == "t").select(
        "episode_uuid", "group_id", "sent_idx", "subj_name", "pred",
        "obj_name", "fact", "valid_at", "invalid_at", "warc_ts",
    )
    spans = all_df.where(F.col("kind") == "m").select(
        "episode_uuid", "group_id", "name", "norm_name", "valid_at"
    )
    return triples, spans


def extract_spans_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Capitalized-span detection only (the cheap half of X1): one
    str.findall pass per batch, honorific-stripped, stop-span filtered."""
    from ..functions.text import normalize_entity_name

    s = _explode_sentences(pdf)
    spans = s.assign(span=s["sentence"].str.findall(SPAN_RE)).explode("span")
    spans = spans[spans["span"].notna()]
    spans["name"] = spans["span"].map(strip_honorific)
    spans = spans[~spans["name"].isin(STOP_SPANS)]
    out = spans[["episode_uuid", "group_id", "name", "valid_at"]].drop_duplicates(
        ["episode_uuid", "name"]
    )
    out["norm_name"] = out["name"].map(normalize_entity_name)
    return out[
        ["episode_uuid", "group_id", "name", "norm_name", "valid_at"]
    ].reset_index(drop=True)


def extract_triples(episodes: DataFrame) -> DataFrame:
    cols = episodes.select("uuid", "group_id", "content", "valid_at")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_triples_pdf(pdf)

    return cols.mapInPandas(gen, schema=TRIPLES_RAW)


def _role_case(which: int) -> str:
    branches = " ".join(
        f"WHEN '{p}' THEN '{roles[which]}'" for p, roles in PRED_ROLES.items()
    )
    return f"CASE pred {branches} END"


def mention_labels(triples: DataFrame) -> DataFrame:
    """Global role vote per (group_id, name) from the triples the mention
    participates in (X2 typing): plurality with label-name tie-break —
    deterministic regardless of batch/partition layout (unlike a per-batch
    vote)."""
    from pyspark.sql import Window

    roles = triples.selectExpr(
        "group_id", "subj_name AS name", f"{_role_case(0)} AS label"
    ).unionAll(
        triples.selectExpr("group_id", "obj_name AS name", f"{_role_case(1)} AS label")
    )
    w = Window.partitionBy("group_id", "name").orderBy(
        F.desc("n"), F.asc("label")
    )
    return (
        roles.groupBy("group_id", "name", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("group_id", "name", "label")
    )


def attach_labels(spans: DataFrame, triples: DataFrame) -> DataFrame:
    """Mention rows = spans + globally-voted labels (X2). Unmatched spans
    get the bare 'Entity' label (node_operations.py:191-209 drops unknown
    types to Entity)."""
    labels = mention_labels(triples)
    return (
        spans.join(F.broadcast(labels), ["group_id", "name"], "left")
        .withColumn("label", F.coalesce("label", F.lit("Entity")))
        .select("episode_uuid", "group_id", "name", "norm_name", "label", "valid_at")
    )


def extract_mentions(episodes: DataFrame, triples: DataFrame) -> DataFrame:
    """Spans (cheap pandas pass) + labels voted from the already-extracted
    triples (Spark-side) — avoids re-running the 8-pattern triple
    extraction inside the mention pass."""
    cols = episodes.select("uuid", "group_id", "content", "valid_at")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_spans_pdf(pdf)

    span_schema = (
        "episode_uuid string, group_id string, name string,"
        " norm_name string, valid_at timestamp"
    )
    spans = cols.mapInPandas(gen, schema=span_schema)
    return attach_labels(spans, triples)
