"""Deterministic synthetic web-page corpus shared by the Spark pipeline,
the pure-pandas golden oracle, and the DuckDB oracle-SQL builder.

The north rule requires an input Iceberg table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)``. This module derives such a table
*deterministically* from the driver-provided ``documents.parquet``
(``doc_id, text, lang, source, n_chars``): every page's text is a pure
function of ``(doc_id, source, documents.text)``, so the exact same corpus
can be reconstructed in three independent ways:

1. the Spark source job (`graphiti_spark.sources.pages`) via an Arrow UDF,
2. the single-process pandas golden generator (`golden_pages`), and
3. plain ANSI SQL emitted by `sql_*` builders, runnable by DuckDB —
   which is what the driver's oracle-correctness gate consumes.

Sentences are rendered from closed template banks so the downstream
*extraction* ground truth (mentions, (subj, pred, obj) triples, temporal
validity) is generatively known. The extraction pipeline never sees this
module's generative knowledge — it runs real regex/gazetteer extraction on
the text — and must reproduce the generative truth exactly (the P/R >= 0.95
north metric; we target 1.0 on this corpus).

Reference semantics mirrored here (file:line into /root/reference):
- episode construction: graphiti_core/nodes.py:130-141 (EpisodicNode)
- "full explicit names" extraction guideline: prompts/extract_nodes.py:63-140
- triple schema (relation ALL-CAPS + fact sentence): prompts/extract_edges.py:25-30
- temporal attribution relative to reference_timestamp:
  utils/maintenance/temporal_operations.py:32-68
"""

from __future__ import annotations

from datetime import datetime, timedelta

# --------------------------------------------------------------------------
# Entity banks. All display forms are sequences of capitalized words so a
# capitalized-span detector recovers them exactly. Persons are 2 words,
# orgs are 2 words (optionally + " Inc"), places 1 word.
# --------------------------------------------------------------------------

PERSONS = [
    "Alice Johnson", "Bob Hartley", "Carol Mendes", "David Okafor",
    "Emma Larsen", "Frank Moreau", "Grace Kimura", "Henry Walsh",
    "Irene Castillo", "James Whitfield", "Karen Sobol", "Liam Novak",
    "Mona Farid", "Noah Bergman", "Olga Petrova", "Paul Duarte",
]
ORGS = [
    "Acme Corp", "Globex Systems", "Initech Labs", "Umbrella Holdings",
    "Vantage Analytics", "Nimbus Software", "Quantum Forge", "Helios Energy",
    "Cobalt Partners", "Zephyr Logistics", "Orchid Biotech", "Pinnacle Media",
]
PLACES = [
    "Paris", "Berlin", "Oslo", "Lisbon", "Madrid",
    "Vienna", "Prague", "Dublin", "Zurich", "Athens",
]

HONORIFIC = "Professor "
ORG_SUFFIX = " Inc"
ZWSP = "\u200b"  # injected into every 3rd page title; cleaning must strip it

N_TEMPLATES = 8
EPOCH = datetime(2024, 1, 1)          # warc_ts base
WARC_STEP_MINUTES = 7                 # warc_ts = EPOCH + doc_id * 7 min

# predicate -> (contradiction class, polarity). Edges in the same class on
# the same canonical (src, dst) pair with opposite polarity contradict each
# other (mirrors graphiti's invalidate_edges LLM step with a deterministic
# antonym table; golden behaviour per
# tests/utils/maintenance/test_temporal_operations_int.py:97-331).
CONTRA_CLASS = {
    "WORKS_AT": ("WORKS_AT", 1),
    "NO_LONGER_WORKS_AT": ("WORKS_AT", -1),
    "LIKES": ("LIKES", 1),
    "DISLIKES": ("LIKES", -1),
}

PRED_ROLES = {
    # predicate -> (subject label, object label)
    "WORKS_AT": ("Person", "Organization"),
    "NO_LONGER_WORKS_AT": ("Person", "Organization"),
    "LIKES": ("Person", "Person"),
    "DISLIKES": ("Person", "Person"),
    "BASED_IN": ("Organization", "Place"),
    "MOVED_TO": ("Person", "Place"),
    "LEADS": ("Person", "Organization"),
    "VISITED": ("Person", "Place"),
}


# --------------------------------------------------------------------------
# Pure index arithmetic (must stay expressible in ANSI SQL: + * %).
# --------------------------------------------------------------------------

def doc_sentence_count(d: int) -> int:
    return 3 + d % 4


def sentence_fields(d: int, k: int) -> dict:
    """All generative choices for sentence k of doc d."""
    t = (d * 3 + k * 5) % N_TEMPLATES
    # halving decorrelates pi's parity from t's (both d*odd+k*odd would be
    # ≡ d+k mod 2, making contradicting templates hit disjoint persons)
    pi = ((d * 7 + k * 13) // 2) % len(PERSONS)
    # org/person2 are tied to the person (2-3 variants) so the same
    # canonical pair recurs across documents — this is what makes
    # WORKS_AT vs NO_LONGER_WORKS_AT / LIKES vs DISLIKES contradictions
    # (and edge dedup) actually occur in the corpus
    pj = (pi + 1 + d % 3) % len(PERSONS)
    oi = (pi * 3 + d % 2) % len(ORGS)
    li = (d * 5 + k * 7) % len(PLACES)
    year = 2015 + (d + k) % 9
    date = EPOCH + timedelta(days=(d * 13 + k * 29) % 365)
    honor = (d + 3 * k) % 7 == 0
    org_inc = (d + 2 * k) % 5 == 0
    person = PERSONS[pi]
    person2 = PERSONS[pj]
    org = ORGS[oi]
    place = PLACES[li]
    return {
        "t": t,
        "person": person,
        "person2": person2,
        "org": org,
        "place": place,
        "year": year,
        "date_iso": date.strftime("%Y-%m-%d"),
        "person_display": (HONORIFIC + person) if honor else person,
        "org_display": (org + ORG_SUFFIX) if org_inc else org,
    }


def render_sentence(f: dict) -> str:
    t = f["t"]
    if t == 0:
        return f"{f['person_display']} works at {f['org_display']}."
    if t == 1:
        return f"{f['person_display']} no longer works at {f['org_display']}."
    if t == 2:
        return f"{f['person_display']} likes {f['person2']}."
    if t == 3:
        return f"{f['person_display']} dislikes {f['person2']}."
    if t == 4:
        return f"{f['org_display']} is based in {f['place']}."
    if t == 5:
        return f"{f['person_display']} moved to {f['place']}."
    if t == 6:
        return f"Since {f['year']}, {f['person_display']} has led {f['org_display']}."
    return f"{f['person_display']} visited {f['place']} on {f['date_iso']}."


def sentence_triple(f: dict) -> tuple[str, str, str, str]:
    """(subj, pred, obj, valid_kind) ground truth for a sentence.

    valid_kind: 'ref' -> episode warc_ts; 'year' -> Jan 1 of f['year'];
    'date' -> f['date_iso'] midnight. Honorifics are not part of names
    (extraction strips them); the org ' Inc' suffix IS part of the
    extracted display name (alias resolved later).
    """
    t = f["t"]
    if t == 0:
        return f["person"], "WORKS_AT", f["org_display"], "ref"
    if t == 1:
        return f["person"], "NO_LONGER_WORKS_AT", f["org_display"], "ref"
    if t == 2:
        return f["person"], "LIKES", f["person2"], "ref"
    if t == 3:
        return f["person"], "DISLIKES", f["person2"], "ref"
    if t == 4:
        return f["org_display"], "BASED_IN", f["place"], "ref"
    if t == 5:
        return f["person"], "MOVED_TO", f["place"], "ref"
    if t == 6:
        return f["person"], "LEADS", f["org_display"], "year"
    return f["person"], "VISITED", f["place"], "date"


# --------------------------------------------------------------------------
# Page assembly.
# --------------------------------------------------------------------------

def page_url(d: int, source: str) -> str:
    return f"https://{source}.example.com/doc/{d}"


def page_warc_ts(d: int) -> datetime:
    return EPOCH + timedelta(minutes=WARC_STEP_MINUTES * d)


def page_title(d: int, source: str) -> str:
    # all-lowercase on purpose: must contribute zero entity mentions
    return f"web digest {d} - {source} daily notes"


def page_sentences(d: int) -> list[str]:
    return [render_sentence(sentence_fields(d, k)) for k in range(doc_sentence_count(d))]


def page_text(d: int, source: str, noise: str) -> str:
    """Raw page text (pre-clean). Pure function of (d, source, noise)."""
    title = page_title(d, source)
    if d % 3 == 0:
        title += ZWSP
    sents = page_sentences(d)
    paras = [" ".join(sents[i : i + 2]) for i in range(0, len(sents), 2)]
    return title + "\n\n" + noise[:120] + "\n\n" + "\n\n".join(paras)


def page_html(text: str) -> bytes:
    return ("<html><body><p>" + text.replace("\n\n", "</p><p>") + "</p></body></html>").encode("utf-8")


# --------------------------------------------------------------------------
# SQL builders (DuckDB oracle). Emit CTE bodies over the pre-registered
# `documents` view. DuckDB arrays are 1-indexed; all arithmetic mirrors the
# Python above term-for-term.
# --------------------------------------------------------------------------

def _sql_array(name: str, values: list[str]) -> str:
    items = ", ".join("'" + v.replace("'", "''") + "'" for v in values)
    return f"[{items}]"


def sql_pages_cte() -> str:
    """CTE `pages_g`: (doc_id, url, group_id, lang, warc_ts, clean_text).

    clean_text is the post-clean text (ZWSP removed), i.e. what the engine's
    byte-identical cleaned text must equal per url.
    """
    persons = _sql_array("p", PERSONS)
    orgs = _sql_array("o", ORGS)
    places = _sql_array("l", PLACES)
    np, no, nl = len(PERSONS), len(ORGS), len(PLACES)
    return f"""
sent_g AS (
  SELECT d.doc_id, d.source, d.lang, d.text AS noise, k.k,
         (d.doc_id*3 + k.k*5) % {N_TEMPLATES} AS t,
         ({persons})[1 + ((d.doc_id*7 + k.k*13) // 2) % {np}] AS person,
         ({persons})[1 + ((((d.doc_id*7 + k.k*13) // 2) % {np}) + 1 + d.doc_id % 3) % {np}] AS person2,
         ({orgs})[1 + ((((d.doc_id*7 + k.k*13) // 2) % {np}) * 3 + d.doc_id % 2) % {no}] AS org,
         ({places})[1 + (d.doc_id*5 + k.k*7) % {nl}] AS place,
         2015 + (d.doc_id + k.k) % 9 AS yr,
         strftime(TIMESTAMP '2024-01-01' + INTERVAL 1 DAY * ((d.doc_id*13 + k.k*29) % 365), '%Y-%m-%d') AS date_iso,
         ((d.doc_id + 3*k.k) % 7 = 0) AS honor,
         ((d.doc_id + 2*k.k) % 5 = 0) AS org_inc
  FROM documents d
  JOIN (SELECT unnest(range(0, 6)) AS k) k
    ON k.k < 3 + d.doc_id % 4
),
sent_r AS (
  SELECT *,
         CASE WHEN honor THEN '{HONORIFIC}' || person ELSE person END AS person_display,
         CASE WHEN org_inc THEN org || '{ORG_SUFFIX}' ELSE org END AS org_display
  FROM sent_g
),
sent AS (
  SELECT doc_id, source, lang, noise, k, t, person, person2, org, place, yr, date_iso,
         person_display, org_display,
         CASE t
           WHEN 0 THEN person_display || ' works at ' || org_display || '.'
           WHEN 1 THEN person_display || ' no longer works at ' || org_display || '.'
           WHEN 2 THEN person_display || ' likes ' || person2 || '.'
           WHEN 3 THEN person_display || ' dislikes ' || person2 || '.'
           WHEN 4 THEN org_display || ' is based in ' || place || '.'
           WHEN 5 THEN person_display || ' moved to ' || place || '.'
           WHEN 6 THEN 'Since ' || yr || ', ' || person_display || ' has led ' || org_display || '.'
           ELSE person_display || ' visited ' || place || ' on ' || date_iso || '.'
         END AS sentence
  FROM sent_r
),
pages_g AS (
  SELECT d.doc_id,
         'https://' || d.source || '.example.com/doc/' || d.doc_id AS url,
         d.source AS group_id, d.lang,
         TIMESTAMP '2024-01-01' + INTERVAL {WARC_STEP_MINUTES} MINUTE * d.doc_id AS warc_ts,
         'web digest ' || d.doc_id || ' - ' || d.source || ' daily notes'
           || chr(10) || chr(10) || substr(d.text, 1, 120) || chr(10) || chr(10)
           || (SELECT string_agg(pp.para, chr(10) || chr(10) ORDER BY pp.pk)
               FROM (SELECT s.doc_id AS sdoc, s.k // 2 AS pk,
                            string_agg(s.sentence, ' ' ORDER BY s.k) AS para
                     FROM sent s GROUP BY s.doc_id, s.k // 2) pp
               WHERE pp.sdoc = d.doc_id)
           AS clean_text
  FROM documents d
)"""


def sql_triples_cte() -> str:
    """CTE `triples_g` (requires sql_pages_cte() first): ground-truth triples
    per (doc_id, k): subj/pred/obj display names + valid_at + fact sentence +
    paragraph (chunk) index.
    """
    return """
triples_g AS (
  SELECT s.doc_id, s.k, s.k // 2 + 2 AS para_idx, s.sentence AS fact,
         CASE s.t
           WHEN 0 THEN s.person WHEN 1 THEN s.person WHEN 2 THEN s.person
           WHEN 3 THEN s.person WHEN 4 THEN s.org_display WHEN 5 THEN s.person
           WHEN 6 THEN s.person ELSE s.person END AS subj,
         CASE s.t
           WHEN 0 THEN 'WORKS_AT' WHEN 1 THEN 'NO_LONGER_WORKS_AT'
           WHEN 2 THEN 'LIKES' WHEN 3 THEN 'DISLIKES' WHEN 4 THEN 'BASED_IN'
           WHEN 5 THEN 'MOVED_TO' WHEN 6 THEN 'LEADS' ELSE 'VISITED' END AS pred,
         CASE s.t
           WHEN 0 THEN s.org_display WHEN 1 THEN s.org_display
           WHEN 2 THEN s.person2 WHEN 3 THEN s.person2 WHEN 4 THEN s.place
           WHEN 5 THEN s.place WHEN 6 THEN s.org_display ELSE s.place END AS obj,
         CASE s.t
           WHEN 6 THEN (s.yr || '-01-01')::TIMESTAMP
           WHEN 7 THEN s.date_iso::TIMESTAMP
           ELSE p.warc_ts END AS valid_at,
         p.url, p.group_id, p.warc_ts
  FROM sent s JOIN pages_g p ON p.doc_id = s.doc_id
)"""


# --------------------------------------------------------------------------
# Pure-pandas golden generator (single-process oracle used by pytest).
# --------------------------------------------------------------------------

def golden_pages(documents) -> "pandas.DataFrame":  # noqa: F821
    """documents: pandas DF with doc_id, text, lang, source.
    Returns pages DF (url, warc_ts, html, text, lang, doc_id, group_id)."""
    import pandas as pd

    rows = []
    for r in documents.itertuples(index=False):
        d = int(r.doc_id)
        text = page_text(d, r.source, r.text)
        rows.append(
            {
                "url": page_url(d, r.source),
                "warc_ts": page_warc_ts(d),
                "html": page_html(text),
                "text": text,
                "lang": r.lang,
                "doc_id": d,
                "group_id": r.source,
            }
        )
    return pd.DataFrame(rows)


def golden_triples(documents) -> "pandas.DataFrame":  # noqa: F821
    """Generative ground-truth triples (the 'reference golden triples' the
    north metric scores against)."""
    import pandas as pd

    rows = []
    for r in documents.itertuples(index=False):
        d = int(r.doc_id)
        warc = page_warc_ts(d)
        for k in range(doc_sentence_count(d)):
            f = sentence_fields(d, k)
            subj, pred, obj, kind = sentence_triple(f)
            if kind == "year":
                valid = datetime(f["year"], 1, 1)
            elif kind == "date":
                valid = datetime.strptime(f["date_iso"], "%Y-%m-%d")
            else:
                valid = warc
            rows.append(
                {
                    "doc_id": d,
                    "k": k,
                    "para_idx": k // 2 + 2,
                    "url": page_url(d, r.source),
                    "group_id": r.source,
                    "subj": subj,
                    "pred": pred,
                    "obj": obj,
                    "fact": render_sentence(f),
                    "valid_at": valid,
                    "warc_ts": warc,
                }
            )
    return pd.DataFrame(rows)
