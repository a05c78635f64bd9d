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

The production hot path is ALL-JVM: sentence split, pattern dispatch,
group extraction, span scan and name normalization are Spark SQL regexp
expressions inside whole-stage codegen — no Python workers and no Arrow
transfer anywhere in the flagship pipeline. The pandas twins
(extract_*_pdf) are kept as the single-process parity oracle used by
pytest (tests/test_extraction_golden.py pins JVM output == generative
golden truth).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.text import strip_honorific

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
    """Single-process pandas twin of the JVM extraction (the pytest parity
    oracle): kind='t' triple rows (X3/X4) and kind='m' mention rows (X1)."""
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


# --- JVM-native extraction (the production hot path) -----------------------
# Every regex below runs inside whole-stage codegen: sentence split,
# pattern dispatch, group extraction, span scan and name normalization are
# Spark SQL expressions — no Python workers, no Arrow transfer. The pandas
# twins above remain as the single-process parity oracle
# (tests/test_extraction_golden.py pins JVM == golden truth).

def _sql_lit(pat: str) -> str:
    """Python regex -> Spark SQL string literal (backslashes doubled)."""
    return pat.replace("\\", "\\\\")


SENT_SPLIT_SQL = _sql_lit(SENT_SPLIT)
NAME_SQL = _sql_lit(NAME)
_HONORIFIC_SQL = _sql_lit(r"^(?:Professor |Dr\. )")

# (pattern, pred, subj_group, obj_group, valid_expr_template) in the same
# priority order as _PATTERNS (negated form before its positive twin)
_JVM_PATTERNS: list[tuple[str, str, int, int, str | None]] = [
    (_sql_lit(rf"^{NAME_G} no longer works at {NAME_G}\.$"), "NO_LONGER_WORKS_AT", 1, 2, None),
    (_sql_lit(rf"^{NAME_G} works at {NAME_G}\.$"), "WORKS_AT", 1, 2, None),
    (_sql_lit(rf"^{NAME_G} likes {NAME_G}\.$"), "LIKES", 1, 2, None),
    (_sql_lit(rf"^{NAME_G} dislikes {NAME_G}\.$"), "DISLIKES", 1, 2, None),
    (_sql_lit(rf"^{NAME_G} is based in {NAME_G}\.$"), "BASED_IN", 1, 2, None),
    (_sql_lit(rf"^{NAME_G} moved to {NAME_G}\.$"), "MOVED_TO", 1, 2, None),
    (
        _sql_lit(rf"^Since (\d{{4}}), {NAME_G} has led {NAME_G}\.$"),
        "LEADS", 2, 3,
        "to_timestamp(regexp_extract(sentence, '{p}', 1) || '-01-01', 'yyyy-MM-dd')",
    ),
    (
        _sql_lit(rf"^{NAME_G} visited {NAME_G} on (\d{{4}}-\d{{2}}-\d{{2}})\.$"),
        "VISITED", 1, 2,
        "to_timestamp(regexp_extract(sentence, '{p}', 3), 'yyyy-MM-dd')",
    ),
]

# normalize_entity_name (functions/text.py) as one SQL expression chain:
# lowercase -> strip one honorific prefix -> strip trailing corporate
# suffix tokens (never emptying a single-token name)
_NORM_SQL = (
    "coalesce(nullif(regexp_replace(regexp_replace(lower(name),"
    " '^(professor |dr\\\\. |dr |mr\\\\. |ms\\\\. |mrs\\\\. )', ''),"
    " '( (inc|llc|ltd))+$', ''), ''), lower(name))"
)


def _sentences(episodes: DataFrame) -> DataFrame:
    """(episode_uuid, group_id, valid_at, sent_idx, sentence) — the
    filter() inside the array keeps sent_idx equal to the pandas
    cumcount-over-nonempty semantics without a window shuffle."""
    return episodes.select(
        F.col("uuid").alias("episode_uuid"),
        "group_id",
        "valid_at",
        F.posexplode(
            F.expr(f"filter(split(content, '{SENT_SPLIT_SQL}'), s -> s != '')")
        ).alias("sent_idx", "sentence"),
    )


def _case(branches: list[tuple[str, str]]) -> str:
    return (
        "CASE "
        + " ".join(f"WHEN sentence RLIKE '{p}' THEN {v}" for p, v in branches)
        + " END"
    )


def extract_triples_jvm(sents: DataFrame) -> DataFrame:
    strip = lambda e: f"regexp_replace({e}, '{_HONORIFIC_SQL}', '')"  # noqa: E731
    pred = _case([(p, f"'{name}'") for p, name, *_ in _JVM_PATTERNS])
    subj = _case(
        [(p, strip(f"regexp_extract(sentence, '{p}', {sg})"))
         for p, _, sg, _, _ in _JVM_PATTERNS]
    )
    obj = _case(
        [(p, strip(f"regexp_extract(sentence, '{p}', {og})"))
         for p, _, _, og, _ in _JVM_PATTERNS]
    )
    explicit = _case(
        [(p, v.format(p=p)) for p, _, _, _, v in _JVM_PATTERNS if v is not None]
    )
    return (
        sents.withColumn("pred", F.expr(pred))
        .where(F.col("pred").isNotNull())
        .select(
            "episode_uuid",
            "group_id",
            F.col("sent_idx").cast("int").alias("sent_idx"),
            F.expr(subj).alias("subj_name"),
            "pred",
            F.expr(obj).alias("obj_name"),
            F.col("sentence").alias("fact"),
            F.coalesce(F.expr(explicit), F.col("valid_at")).alias("valid_at"),
            F.lit(None).cast("timestamp").alias("invalid_at"),
            F.col("valid_at").alias("warc_ts"),
        )
    )


def extract_spans_jvm(sents: DataFrame) -> DataFrame:
    return (
        sents.select(
            "episode_uuid",
            "group_id",
            "valid_at",
            F.explode(
                F.expr(f"regexp_extract_all(sentence, '{NAME_SQL}', 0)")
            ).alias("span"),
        )
        .withColumn("name", F.expr(f"regexp_replace(span, '{_HONORIFIC_SQL}', '')"))
        .where(~F.col("name").isin(*STOP_SPANS))
        .dropDuplicates(["episode_uuid", "name"])
        .withColumn("norm_name", F.expr(_NORM_SQL))
        .select("episode_uuid", "group_id", "name", "norm_name", "valid_at")
    )


def extract_all(episodes: DataFrame) -> DataFrame:
    """Extraction stage, all-JVM. Downstream: filter kind='t' for triples,
    kind='m' for mentions. Persist/materialize this output — it is the
    skinny fan-out point of the whole pipeline (no page/episode content
    strings)."""
    sents = _sentences(episodes)
    trip = extract_triples_jvm(sents).select(
        F.lit("t").alias("kind"), "episode_uuid", "group_id", "sent_idx",
        "subj_name", "pred", "obj_name", "fact", "valid_at", "invalid_at",
        "warc_ts",
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("norm_name"),
    )
    ment = extract_spans_jvm(sents).select(
        F.lit("m").alias("kind"), "episode_uuid", "group_id",
        F.lit(0).alias("sent_idx"),
        F.lit(None).cast("string").alias("subj_name"),
        F.lit(None).cast("string").alias("pred"),
        F.lit(None).cast("string").alias("obj_name"),
        F.lit(None).cast("string").alias("fact"),
        "valid_at",
        F.lit(None).cast("timestamp").alias("invalid_at"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        "name", "norm_name",
    )
    return trip.unionByName(ment)


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
    return extract_triples_jvm(_sentences(episodes))


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
    """Spans (JVM regexp_extract_all pass) + labels voted from the
    already-extracted triples — avoids re-running the 8-pattern triple
    extraction inside the mention pass."""
    return attach_labels(extract_spans_jvm(_sentences(episodes)), triples)
