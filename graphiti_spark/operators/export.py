"""KG -> training-data / interchange exports.

The reference stores every fact as a natural-language sentence on the
edge itself (EntityEdge.fact, /root/reference/graphiti_core/edges.py:199
-208) precisely so the graph can be consumed as TEXT — by rerankers, by
RAG context builders, and by downstream training pipelines. These
operators close that loop at corpus scale, turning the canonical triple
table into:

- `verbalize_triples`: one deterministic pretraining passage per
  (group_id, subject) — each fact rendered with its temporal qualifier
  and the passage assembled in a total (binary-collation) sentence
  order, so the output is reproducible and oracle-checkable.
- `qa_pairs`: supervised QA rows (question template per ontology
  predicate, answer = object) with validity + episode-support columns —
  the SFT-data analogue of the reference's edge facts.
- `ntriples_lines`: RDF N-Triples interchange lines, with temporal
  validity and the fact sentence attached via RDF-star quoted-triple
  statements — the export a reference user would feed to a triple store.

Everything is a single whole-stage-codegen projection (plus one
partial-agg groupBy for the passages): no Python in the hot path, no
shuffle beyond the one keyed agg, so the exports scale exactly as far
as the triple table itself. The sentence/question CASE expressions are
shared VERBATIM with the DuckDB oracles (registry) — parity by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# Shared SQL fragments — legal and identical in Spark SQL and DuckDB.
# (cast(ts as string) -> 'yyyy-MM-dd HH:mm:ss' in both engines; || concat;
#  lower/replace/substr identical.)

_VERB = "lower(replace(pred, '_', ' '))"
_D_VALID = "substr(cast(valid_at as string), 1, 10)"
_D_INVALID = "substr(cast(invalid_at as string), 1, 10)"

SENTENCE_SQL = f"""CASE
  WHEN valid_at IS NOT NULL AND invalid_at IS NOT NULL THEN
    'From ' || {_D_VALID} || ' to ' || {_D_INVALID} || ', ' ||
    subj || ' ' || {_VERB} || ' ' || obj || '.'
  WHEN valid_at IS NOT NULL THEN
    'Since ' || {_D_VALID} || ', ' || subj || ' ' || {_VERB} || ' ' || obj || '.'
  WHEN invalid_at IS NOT NULL THEN
    'Until ' || {_D_INVALID} || ', ' || subj || ' ' || {_VERB} || ' ' || obj || '.'
  ELSE subj || ' ' || {_VERB} || ' ' || obj || '.'
END"""

# One question surface form per ontology predicate (ontology.py
# DOMAIN_RANGE); unknown predicates take the generic linked-via form so
# custom ontologies export without code changes.
QUESTION_SQL = f"""CASE pred
  WHEN 'WORKS_AT' THEN 'Where does ' || subj || ' work?'
  WHEN 'NO_LONGER_WORKS_AT' THEN 'Where did ' || subj || ' formerly work?'
  WHEN 'LIKES' THEN 'Whom does ' || subj || ' like?'
  WHEN 'DISLIKES' THEN 'Whom does ' || subj || ' dislike?'
  WHEN 'BASED_IN' THEN 'Where is ' || subj || ' based?'
  WHEN 'MOVED_TO' THEN 'Where did ' || subj || ' move?'
  WHEN 'LEADS' THEN 'What does ' || subj || ' lead?'
  WHEN 'VISITED' THEN 'Which place did ' || subj || ' visit?'
  WHEN 'ADMIRES' THEN 'Whom does ' || subj || ' admire?'
  ELSE 'Which entity is linked to ' || subj || ' via ' || {_VERB} || '?'
END"""


def verbalize_triples(triples: DataFrame) -> DataFrame:
    """(group_id, subj) -> pretraining passage over the subject's facts.

    Sentences are rendered per fact (temporal qualifiers from
    valid_at/invalid_at), then assembled in ascending binary sentence
    order — array_sort here, `string_agg(... ORDER BY sentence)` in the
    oracle; both are binary collation, so the passages match
    byte-for-byte. One partial-agg'd groupBy on (group_id, subj); the
    token count is a post-agg projection.
    """
    return (
        triples.withColumn("sentence", F.expr(SENTENCE_SQL))
        .groupBy("group_id", "subj")
        .agg(
            F.array_join(F.array_sort(F.collect_list("sentence")), " ").alias(
                "passage"
            ),
            F.count("*").cast("long").alias("n_facts"),
        )
        .withColumn(
            "n_tokens", F.size(F.split(F.col("passage"), " ")).cast("long")
        )
    )


def qa_pairs(triples: DataFrame) -> DataFrame:
    """One supervised QA row per canonical triple.

    `currently_true` (0/1) lets a consumer split temporally-valid
    training pairs from superseded ones; `support` carries the episode
    count as a confidence weight. Pure projection — no shuffle.
    """
    return triples.select(
        "group_id",
        "pred",
        F.expr(QUESTION_SQL).alias("question"),
        F.col("obj").alias("answer"),
        F.col("invalid_at").isNull().cast("int").alias("currently_true"),
        F.col("n_episodes").alias("support"),
    )


def _nt_escape(col):
    """N-Triples literal escaping (backslash first, then quote/newline/
    tab). Built with DataFrame functions, NOT F.expr: Spark SQL string
    literals interpret backslash escapes while DuckDB's do not, so a
    shared SQL fragment could not express this identically — the oracle
    mirrors the same chain in DuckDB literal syntax."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    return F.replace(c, F.lit("\t"), F.lit("\\t"))


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """RDF N-Triples export of the canonical graph.

    Per triple: one `spo` assertion line, one RDF-star `fact` line
    carrying the evidence sentence as a literal, and (when present)
    `valid_from` / `valid_until` RDF-star lines with xsd:date objects.
    Entity IRIs are md5-based within the group namespace — stable across
    runs, no escaping concerns. Output is one narrow string column plus
    (group_id, kind) for partitioned writes; a line-oriented sink can
    write it as-is.
    """
    ent = lambda c: F.concat(  # noqa: E731
        F.lit("<urn:kg:"), F.col("group_id"), F.lit(":e:"), F.md5(F.col(c)), F.lit(">")
    )
    s_iri, o_iri = ent("subj"), ent("obj")
    p_iri = F.concat(F.lit("<urn:kg:p:"), F.lower(F.col("pred")), F.lit(">"))
    quoted = F.concat(
        F.lit("<< "), s_iri, F.lit(" "), p_iri, F.lit(" "), o_iri, F.lit(" >>")
    )
    date_obj = lambda c: F.concat(  # noqa: E731
        F.lit('"'),
        F.substring(F.col(c).cast("string"), 1, 10),
        F.lit('"^^<http://www.w3.org/2001/XMLSchema#date>'),
    )
    base = triples.select("group_id", "subj", "pred", "obj", "fact",
                          "valid_at", "invalid_at")
    spo = base.select(
        "group_id",
        F.lit("spo").alias("kind"),
        F.concat(s_iri, F.lit(" "), p_iri, F.lit(" "), o_iri, F.lit(" .")).alias(
            "line"
        ),
    )
    fact = base.select(
        "group_id",
        F.lit("fact").alias("kind"),
        F.concat(
            quoted,
            F.lit(' <urn:kg:p:fact> "'),
            _nt_escape(F.col("fact")),
            F.lit('" .'),
        ).alias("line"),
    )
    vfrom = base.where(F.col("valid_at").isNotNull()).select(
        "group_id",
        F.lit("valid_from").alias("kind"),
        F.concat(
            quoted, F.lit(" <urn:kg:p:valid_from> "), date_obj("valid_at"), F.lit(" .")
        ).alias("line"),
    )
    vuntil = base.where(F.col("invalid_at").isNotNull()).select(
        "group_id",
        F.lit("valid_until").alias("kind"),
        F.concat(
            quoted,
            F.lit(" <urn:kg:p:valid_until> "),
            date_obj("invalid_at"),
            F.lit(" ."),
        ).alias("line"),
    )
    return spo.unionByName(fact).unionByName(vfrom).unionByName(vuntil)
