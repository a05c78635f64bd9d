"""Driver-facing query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus, where SQL-expressible, the
equivalent DuckDB oracle SQL over the driver's pre-registered parquet views
(`documents`, `embeddings`, ...).

Column names and integer widths are aligned on both sides (everything
integral is BIGINT; ratios are exact integer micro-units) so the driver's
order-insensitive value-hash comparison is bit-exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import corpus
from .operators import ann, docs
from .operators import docs as docs_mod
from .operators.materialize import JOB_TS
from .plans.pipeline import GraphTables, build_graph, triples_view

# ---------------------------------------------------------------------------
# KG pipeline queries (memoized per sf_dir — the driver runs queries one by
# one against the same SparkSession).
# ---------------------------------------------------------------------------

_GRAPH_CACHE: dict[str, GraphTables] = {}


def _graph(spark: SparkSession, sf_dir: str) -> GraphTables:
    if sf_dir not in _GRAPH_CACHE:
        _GRAPH_CACHE[sf_dir] = build_graph(spark, sf_dir)
    return _GRAPH_CACHE[sf_dir]


def q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship deliverable: deduplicated canonical (subj, pred, obj)
    triples with bi-temporal validity."""
    t = _graph(spark, sf_dir)
    return triples_view(t).select(
        "group_id",
        "subj",
        "pred",
        "obj",
        "fact",
        "valid_at",
        "invalid_at",
        F.size("episodes").cast("long").alias("n_episodes"),
    )


def q_kg_contradictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalidated edges only — the temporal-invalidation contract
    (X10-X12; reference tests test_edge_operations.py:95-237)."""
    return (
        q_kg_triples(spark, sf_dir)
        .where(F.col("invalid_at").isNotNull())
        .withColumn("expired_at", F.lit(JOB_TS))
    )


def q_kg_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean+chunk stage output (S12): one row per episode chunk."""
    t = _graph(spark, sf_dir)
    return t.episodes.select(
        "uuid",
        "url",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "group_id",
        F.length("content").cast("long").alias("n_chars"),
        "valid_at",
    )


def q_kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical entity nodes after resolution (X5/X7 + A8)."""
    t = _graph(spark, sf_dir)
    return t.nodes.select(
        "group_id",
        "name",
        F.array_join(F.col("labels"), "/").alias("labels_str"),
        F.col("n_aliases").cast("long").alias("n_aliases"),
    )


def q_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MENTIONS provenance rollup (X14 + A2): episode-mention count per
    canonical entity."""
    t = _graph(spark, sf_dir)
    counts = t.mention_edges.groupBy("entity_uuid").agg(
        F.count(F.lit(1)).alias("n_mentions")
    )
    names = t.nodes.select(F.col("uuid").alias("entity_uuid"), "group_id", "name")
    return counts.join(F.broadcast(names), "entity_uuid").select(
        "group_id", "name", F.col("n_mentions").cast("long").alias("n_mentions")
    )


# ---------------------------------------------------------------------------
# Document-pipeline queries (training-data ops over `documents`).
# ---------------------------------------------------------------------------


def q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = docs.token_stats(docs.read_documents(spark, sf_dir))
    return out.select(
        "doc_id", *[F.col(c).cast("long").alias(c) for c in out.columns[1:]]
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = docs.quality_scores(docs.read_documents(spark, sf_dir))
    return out.select(
        "doc_id", *[F.col(c).cast("long").alias(c) for c in out.columns[1:]]
    )


def q_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = docs.lang_id(docs.read_documents(spark, sf_dir))
    return out.select(
        "doc_id",
        "lang_declared",
        F.col("en_hits").cast("long").alias("en_hits"),
        F.col("de_hits").cast("long").alias("de_hits"),
        F.col("fr_hits").cast("long").alias("fr_hits"),
        "lang_guess",
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = docs.fingerprints(docs.read_documents(spark, sf_dir))
    return out.select(
        "doc_id", "fingerprint", F.col("n_norm_chars").cast("long").alias("n_norm_chars")
    )


def q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return docs.exact_dup_groups(docs.read_documents(spark, sf_dir)).select(
        "fingerprint",
        F.col("n_docs").cast("long").alias("n_docs"),
        "canonical_doc_id",
    )


def q_doc_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return docs.ngram_jaccard_pairs(docs.read_documents(spark, sf_dir)).select(
        "doc_a",
        "doc_b",
        F.col("shared").cast("long").alias("shared"),
        "jaccard_u",
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = ann.read_embeddings(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    c = emb.where(F.col("vec_id") >= 8).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("ce")
    )
    return ann.brute_force_topk(q, c, k=5).select(
        "q_id", F.col("rank").cast("long").alias("rank"), "c_id"
    )


def _docs_with_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ deterministic perturbed copies of the first 50 docs
    (doc_id + 1_000_000, one appended sentence) — the fixture that makes
    near-dup detection observable on an otherwise-unique corpus."""
    docs = docs_mod.read_documents(spark, sf_dir).select("doc_id", "text")
    dups = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended near duplicate marker")).alias("text"),
    )
    return docs.unionByName(dups)


PAGE_CURSOR = "d0"
PAGE_LIMIT = 50


def q_kg_nodes_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: keyset-paginated partition scan — nodes of two group_ids with a
    uuid-descending cursor and LIMIT (nodes.py:214-252 pagination shape:
    `WHERE uuid < $cursor ORDER BY uuid DESC LIMIT n`)."""
    t = _graph(spark, sf_dir)
    return (
        t.nodes.where(F.col("group_id").isin("src0", "src1"))
        .where(F.col("uuid") < PAGE_CURSOR)
        .orderBy(F.desc("uuid"))
        .limit(PAGE_LIMIT)
        .select("group_id", "uuid", "name")
    )


def q_doc_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, Jaccard-verified (rows-only check —
    crc32 hash family is not DuckDB-expressible; recall/precision vs exact
    Jaccard pinned in tests/test_dedup.py)."""
    from .operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs_with_near_dups(spark, sf_dir), threshold=0.5)


def q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via 16-bit chunk blocking + Hamming verify
    (rows-only check)."""
    from .operators.dedup import simhash_near_pairs

    return simhash_near_pairs(_docs_with_near_dups(spark, sf_dir), max_hamming=6)


def q_kg_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16: label-propagation communities over the canonical entity graph
    (rows-only: iterative fixpoint, not single-query SQL)."""
    from .operators.communities import build_communities

    t = _graph(spark, sf_dir)
    communities, members = build_communities(t.nodes, t.edges)
    return communities.select(
        "uuid", "name", "group_id", F.col("n_members").cast("long").alias("n_members")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "kg_nodes_page": q_kg_nodes_page,
    "doc_minhash_dedup": q_doc_minhash_dedup,
    "doc_simhash_pairs": q_doc_simhash_pairs,
    "kg_communities": q_kg_communities,
    "kg_triples": q_kg_triples,
    "kg_contradictions": q_kg_contradictions,
    "kg_episodes": q_kg_episodes,
    "kg_nodes": q_kg_nodes,
    "kg_mentions": q_kg_mentions,
    "doc_tokens": q_doc_tokens,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_dedup_exact": q_doc_dedup_exact,
    "doc_ngram_pairs": q_doc_ngram_pairs,
    "ann_topk": q_ann_topk,
}


# ---------------------------------------------------------------------------
# DuckDB oracle SQL.
# ---------------------------------------------------------------------------

_CANON_CTES = """
ents AS (
  SELECT DISTINCT group_id, subj AS name FROM triples_g
  UNION
  SELECT DISTINCT group_id, obj FROM triples_g
),
norm AS (
  SELECT group_id, name, regexp_replace(lower(name), ' inc$', '') AS norm_name
  FROM ents
),
canon AS (
  SELECT group_id, norm_name,
         substr(min(lpad(CAST(length(name) AS VARCHAR), 4, '0') || name), 5) AS canon_name
  FROM norm GROUP BY 1, 2
),
cmap AS (
  SELECT n.group_id, n.name, c.canon_name
  FROM norm n JOIN canon c ON c.group_id = n.group_id AND c.norm_name = n.norm_name
)"""

_EDS_CTES = (
    _CANON_CTES
    + """,
raw AS (
  SELECT t.group_id, cs.canon_name AS subj, t.pred, co.canon_name AS obj, t.fact,
         t.valid_at,
         md5(t.url || '|' || t.para_idx) AS episode_uuid,
         md5('edge|' || md5(t.url || '|' || t.para_idx) || '|' || (t.k % 2)) AS raw_uuid
  FROM triples_g t
  JOIN cmap cs ON cs.group_id = t.group_id AND cs.name = t.subj
  JOIN cmap co ON co.group_id = t.group_id AND co.name = t.obj
),
eds AS (
  SELECT group_id, subj, pred, obj,
         arg_min(fact, strftime(valid_at, '%Y-%m-%d %H:%M:%S.%f') || raw_uuid) AS fact,
         min(valid_at) AS valid_at,
         count(DISTINCT episode_uuid) AS n_episodes
  FROM raw GROUP BY 1, 2, 3, 4
),
classed AS (
  SELECT *,
    CASE pred WHEN 'WORKS_AT' THEN 'WORKS_AT' WHEN 'NO_LONGER_WORKS_AT' THEN 'WORKS_AT'
              WHEN 'LIKES' THEN 'LIKES' WHEN 'DISLIKES' THEN 'LIKES' END AS contra_class,
    CASE pred WHEN 'NO_LONGER_WORKS_AT' THEN -1 WHEN 'DISLIKES' THEN -1 ELSE 1 END AS polarity
  FROM eds
),
inv AS (
  SELECT a.group_id, a.subj, a.pred, a.obj, min(b.valid_at) AS contra_valid_at
  FROM classed a
  JOIN classed b ON a.group_id = b.group_id AND a.subj = b.subj AND a.obj = b.obj
   AND a.contra_class IS NOT NULL AND b.contra_class = a.contra_class
   AND b.polarity <> a.polarity AND b.valid_at > a.valid_at
  GROUP BY 1, 2, 3, 4
)"""
)


def _kg_sql(body: str, with_eds: bool = False) -> str:
    ctes = corpus.sql_pages_cte() + "," + corpus.sql_triples_cte()
    ctes += "," + (_EDS_CTES if with_eds else _CANON_CTES)
    return "WITH " + ctes.lstrip() + "\n" + body


_TRIPLES_SELECT = """
SELECT e.group_id, e.subj, e.pred, e.obj, e.fact, e.valid_at,
       i.contra_valid_at AS invalid_at, e.n_episodes
FROM eds e
LEFT JOIN inv i ON i.group_id = e.group_id AND i.subj = e.subj
               AND i.pred = e.pred AND i.obj = e.obj"""


def _sql_kg_triples() -> str:
    return _kg_sql(_TRIPLES_SELECT, with_eds=True)


def _sql_kg_contradictions() -> str:
    body = f"""
, final AS ({_TRIPLES_SELECT})
SELECT *, TIMESTAMP '2024-12-31 00:00:00' AS expired_at
FROM final WHERE invalid_at IS NOT NULL"""
    return _kg_sql(body, with_eds=True)


def _sql_kg_episodes() -> str:
    ctes = corpus.sql_pages_cte()
    return (
        "WITH "
        + ctes.lstrip()
        + """,
chunks AS (
  SELECT url, group_id, warc_ts,
         unnest(string_split(clean_text, chr(10) || chr(10))) AS content,
         generate_subscripts(string_split(clean_text, chr(10) || chr(10)), 1) AS i
  FROM pages_g
)
SELECT md5(url || '|' || (i - 1)) AS uuid, url, CAST(i - 1 AS BIGINT) AS chunk_idx,
       group_id, length(content) AS n_chars, warc_ts AS valid_at
FROM chunks WHERE length(content) > 0"""
    )


def _sql_kg_nodes() -> str:
    body = """
, labs AS (
  SELECT group_id, subj AS name,
         CASE WHEN pred = 'BASED_IN' THEN 'Organization' ELSE 'Person' END AS label
  FROM triples_g
  UNION ALL
  SELECT group_id, obj,
         CASE WHEN pred IN ('WORKS_AT','NO_LONGER_WORKS_AT','LEADS') THEN 'Organization'
              WHEN pred IN ('LIKES','DISLIKES') THEN 'Person' ELSE 'Place' END
  FROM triples_g
),
alias_label AS (SELECT group_id, name, min(label) AS label FROM labs GROUP BY 1, 2)
SELECT n.group_id, c.canon_name AS name,
       string_agg(DISTINCT al.label, '/' ORDER BY al.label) AS labels_str,
       count(DISTINCT n.name) AS n_aliases
FROM norm n
JOIN canon c ON c.group_id = n.group_id AND c.norm_name = n.norm_name
JOIN alias_label al ON al.group_id = n.group_id AND al.name = n.name
GROUP BY 1, 2"""
    return _kg_sql(body)


def _sql_kg_mentions() -> str:
    body = """
, parts AS (
  SELECT DISTINCT group_id, url, para_idx, subj AS name FROM triples_g
  UNION
  SELECT DISTINCT group_id, url, para_idx, obj FROM triples_g
)
SELECT p.group_id, c.canon_name AS name,
       count(DISTINCT p.url || '#' || p.para_idx) AS n_mentions
FROM parts p
JOIN norm n ON n.group_id = p.group_id AND n.name = p.name
JOIN canon c ON c.group_id = n.group_id AND c.norm_name = n.norm_name
GROUP BY 1, 2"""
    return _kg_sql(body)


_BPE_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_EN_SQL = r"\b(the|and|of|is|in|to|a|for|on|with)\b"
_DE_SQL = r"\b(der|die|das|und|ist|nicht|ein|zu)\b"
_FR_SQL = r"\b(le|la|les|et|est|une|dans|pour)\b"


def _sql_doc_tokens() -> str:
    return rf"""
SELECT doc_id, length(text) AS n_chars,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
       len(regexp_extract_all(text, '{_BPE_SQL}')) AS n_bpe_tokens,
       len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct
FROM documents"""


def _sql_doc_quality() -> str:
    return rf"""
WITH base AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
         len(regexp_extract_all(lower(text), '[a-z0-9]')) AS n_word_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
         len(regexp_extract_all(lower(text), '{_EN_SQL}')) AS n_stop,
         length(text) AS n_chars
  FROM documents
),
scored AS (
  SELECT doc_id, n_words,
         (n_stop * 1000000) // greatest(n_words, 1) AS stop_ratio_u,
         (n_punct * 1000000) // greatest(n_chars, 1) AS punct_ratio_u,
         (n_word_chars * 1000000) // greatest(n_words, 1) AS mean_word_len_u
  FROM base
)
SELECT *,
       ((least(n_words, 400) * 1000000) // 400) // 2
         + (1000000 - punct_ratio_u) // 2 AS quality_u
FROM scored"""


def _sql_doc_langid() -> str:
    return f"""
WITH h AS (
  SELECT doc_id, lang AS lang_declared,
         len(regexp_extract_all(lower(text), '{_EN_SQL}')) AS en_hits,
         len(regexp_extract_all(lower(text), '{_DE_SQL}')) AS de_hits,
         len(regexp_extract_all(lower(text), '{_FR_SQL}')) AS fr_hits
  FROM documents
)
SELECT *,
       CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
            WHEN de_hits >= fr_hits AND de_hits > 0 THEN 'de'
            WHEN fr_hits > 0 THEN 'fr' ELSE 'und' END AS lang_guess
FROM h"""


_NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


def _sql_doc_fingerprint() -> str:
    return f"""
SELECT doc_id, md5({_NORM_SQL}) AS fingerprint, length({_NORM_SQL}) AS n_norm_chars
FROM documents"""


def _sql_doc_dedup_exact() -> str:
    return f"""
SELECT md5({_NORM_SQL}) AS fingerprint, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1"""


def _sql_doc_ngram_pairs() -> str:
    return """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 0) + 1),
           i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
  FROM tok
),
ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 10000),
sh2 AS (SELECT sh.* FROM sh JOIN ok USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh2 GROUP BY 1),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT s.doc_a, s.doc_b, s.shared,
       (s.shared * 1000000) // (sa.n_sh + sb.n_sh - s.shared) AS jaccard_u
FROM shared s
JOIN sizes sa ON sa.doc_id = s.doc_a
JOIN sizes sb ON sb.doc_id = s.doc_b
ORDER BY jaccard_u DESC, s.doc_a, s.doc_b
LIMIT 20"""


def _sql_ann_topk() -> str:
    return """
WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings WHERE vec_id >= 8),
scored AS (
  SELECT q.q_id, c.c_id, list_cosine_similarity(c.ce, q.qe) AS score FROM c, q
),
ranked AS (
  SELECT q_id, c_id,
         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank
  FROM scored
)
SELECT q_id, rank, c_id FROM ranked WHERE rank <= 5"""


def _sql_kg_nodes_page() -> str:
    body = f"""
, canonu AS (
  SELECT n.group_id, c.canon_name AS name,
         min(md5('node|' || n.group_id || '|' || n.name)) AS uuid
  FROM norm n JOIN canon c ON c.group_id = n.group_id AND c.norm_name = n.norm_name
  GROUP BY 1, 2
)
SELECT group_id, uuid, name FROM canonu
WHERE group_id IN ('src0', 'src1') AND uuid < '{PAGE_CURSOR}'
ORDER BY uuid DESC LIMIT {PAGE_LIMIT}"""
    return _kg_sql(body)


ORACLES: dict[str, Callable[[], str]] = {
    "kg_nodes_page": _sql_kg_nodes_page,
    "kg_triples": _sql_kg_triples,
    "kg_contradictions": _sql_kg_contradictions,
    "kg_episodes": _sql_kg_episodes,
    "kg_nodes": _sql_kg_nodes,
    "kg_mentions": _sql_kg_mentions,
    "doc_tokens": _sql_doc_tokens,
    "doc_quality": _sql_doc_quality,
    "doc_langid": _sql_doc_langid,
    "doc_fingerprint": _sql_doc_fingerprint,
    "doc_dedup_exact": _sql_doc_dedup_exact,
    "doc_ngram_pairs": _sql_doc_ngram_pairs,
    "ann_topk": _sql_ann_topk,
}


def _merge_extra_registries() -> None:
    from . import registry_search

    QUERIES.update(registry_search.SEARCH_QUERIES)
    ORACLES.update(registry_search.SEARCH_ORACLES)


_merge_extra_registries()


def oracle_sql() -> dict[str, str]:
    return {name: fn() for name, fn in ORACLES.items()}
