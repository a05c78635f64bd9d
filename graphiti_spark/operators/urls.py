"""URL canonicalization + URL-level deduplication — the first dedup
pass of every Common-Crawl-scale ingest (the same page is re-crawled
under scheme/case/tracking-parameter variants long before its text is
compared). Reference scope: the engine ingests pages keyed by url
(BASELINE input_hint; episodes are chunked per url), so url identity IS
document identity upstream of everything else.

Canonical form (the standard crawl-frontier normalization, RFC 3986 §6
syntax-based normalization + the de-facto tracking-param strip):

- scheme and host lowercased; a leading ``www.`` stripped
- default ports dropped (``:80`` for http, ``:443`` for https)
- fragment dropped
- trailing slashes collapsed off the path (root stays ``/`` conceptually;
  an empty path renders as no path, matching the raw-url convention here)
- tracking query parameters removed (utm_*, gclid, fbclid, ref, mc_cid,
  mc_eid); surviving parameters sorted byte-wise so param order is
  identity-irrelevant

Everything is ONE whole-stage-codegen'd projection (regexp extracts +
higher-order array functions — no UDF, no shuffle); the dedup groupBy
shuffles only the skinny (canonical_url, id) projection. The DuckDB
mirror is generated from the SAME constants below, so the Spark side and
the oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tracking parameters stripped during canonicalization (shared by the
# Spark expression and the DuckDB mirror)
TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid|ref|mc_cid|mc_eid)="


def _canon_sql(url: str, *, duck: bool) -> str:
    """Canonicalization as one SQL expression over column `url` —
    engine-portable: only regexp_extract / regexp_replace, split/
    string_split, filter/list_filter, array_sort/list_sort and concat.
    `duck` switches the function dialect, NOT the semantics."""
    if duck:
        split_f, filt, srt, join_f = (
            "string_split", "list_filter", "list_sort", "array_to_string")
        rlike = "regexp_matches(p, '{re}')"
        bs = "\\"  # DuckDB string literals keep backslashes verbatim
    else:
        split_f, filt, srt, join_f = ("split", "filter", "array_sort",
                                      "array_join")
        rlike = "p RLIKE '{re}'"
        bs = "\\\\"  # Spark SQL literals unescape one level
    not_tracking = "NOT " + rlike.format(re=TRACKING_PARAM_RE)
    scheme = f"lower(regexp_extract({url}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    after = f"regexp_replace({url}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"lower(regexp_extract({after}, '^([^/?#]*)', 1))"
    host = (
        f"regexp_replace(regexp_replace(regexp_replace("
        f"{hostport}, '^www{bs}.', ''),"
        f" CASE WHEN {scheme} = 'http' THEN ':80$' ELSE ':~NEVER$' END, ''),"
        f" CASE WHEN {scheme} = 'https' THEN ':443$' ELSE ':~NEVER$' END, '')"
    )
    pathqf = f"regexp_replace({after}, '^[^/?#]*', '')"
    path = (
        f"regexp_replace(regexp_extract({pathqf}, '^([^?#]*)', 1), '/+$', '')"
    )
    query = f"regexp_extract({pathqf}, '{bs}?([^#]*)', 1)"
    kept = (
        f"{join_f}({srt}({filt}({split_f}({query}, '&'),"
        f" p -> p != '' AND {not_tracking})), '&')"
    )
    return (
        f"{scheme} || '://' || {host} || {path}"
        f" || (CASE WHEN {kept} != '' THEN '?' || {kept} ELSE '' END)"
    )


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    return df.withColumn(out_col, F.expr(_canon_sql(url_col, duck=False)))


def url_dup_groups(urls: DataFrame) -> DataFrame:
    """urls: (id long, url string). Returns one row per input with its
    canonical form, the group's surviving id (min id — the crawl keeps
    the first fetch) and a keep flag. The groupBy key is the canonical
    url string — at crawl scale hash-partitioned and skew-safe (a single
    url's variant count is bounded by the crawler, not the corpus)."""
    canon = with_canonical_url(urls)
    groups = canon.groupBy("canonical_url").agg(
        F.min("id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_variants"),
    )
    return (
        canon.join(groups, "canonical_url")
        .select(
            "id",
            "url",
            "canonical_url",
            "canonical_id",
            F.col("n_variants").cast("long").alias("n_variants"),
            F.when(F.col("id") == F.col("canonical_id"), 1)
            .otherwise(0)
            .cast("long")
            .alias("keep"),
        )
    )


def sql_url_dup_groups(urls_cte: str) -> str:
    """DuckDB mirror over a CTE body `urls_cte` yielding (id, url)."""
    canon = _canon_sql("url", duck=True)
    return f"""
WITH urls AS ({urls_cte}),
canon AS (SELECT id, url, {canon} AS canonical_url FROM urls),
grp AS (
  SELECT canonical_url, min(id) AS canonical_id, count(*) AS n_variants
  FROM canon GROUP BY 1
)
SELECT c.id, c.url, c.canonical_url, g.canonical_id,
       CAST(g.n_variants AS BIGINT) AS n_variants,
       CAST(CASE WHEN c.id = g.canonical_id THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM canon c JOIN grp g USING (canonical_url)"""
