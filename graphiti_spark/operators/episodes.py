"""pages -> episodes: clean text (reference-parity) + paragraph chunking.

Everything here is JVM-side (regexp_replace / split / posexplode), so the
whole stage is codegen'd — no Python in the hot path. Cleaning parity with
LLMClient._clean_input (/root/reference/graphiti_core/llm_client/
client.py:63-83) is enforced by tests/test_text.py: Spark strings are
already valid UTF-8, so the reference's encode/decode-ignore roundtrip is
the identity and the remaining semantics (zero-width + control-char
removal, keeping \\n \\r \\t) are one character-class regex.

Episode rows mirror EpisodicNode (/root/reference/graphiti_core/
nodes.py:130-141) with a deterministic uuid (md5 of url|chunk_idx) instead
of uuid4 (nodes.py:79) — required for idempotent re-runs / resumability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import ZERO_WIDTH

# zero-width chars + control chars except \t \n \r  (client.py:73-81)
CLEAN_PATTERN = "[" + ZERO_WIDTH + "\x00-\x08\x0b\x0c\x0e-\x1f]"


def clean_pages(pages: DataFrame) -> DataFrame:
    """Adds text_clean; falls back to stripping html when text is null."""
    html_text = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.decode(F.col("html"), "UTF-8"), "(?i)</p\\s*>|<br\\s*/?>", "\n\n"
                ),
                "<[^>]+>",
                "",
            ),
            "\n{3,}",
            "\n\n",
        ),
        "^\\s+|\\s+$",  # python-side .strip() parity (F.trim is space-only)
        "",
    )
    raw = F.coalesce(F.col("text"), html_text)
    return pages.withColumn("text_clean", F.regexp_replace(raw, CLEAN_PATTERN, ""))


def build_episodes(pages: DataFrame) -> DataFrame:
    """One episode per blank-line paragraph of the cleaned page text."""
    cleaned = clean_pages(pages)
    ep = (
        cleaned.select(
            "url",
            "group_id",
            "warc_ts",
            F.posexplode(F.split("text_clean", "\n\n")).alias("chunk_idx", "content"),
        )
        .where(F.length(F.col("content")) > 0)
        .withColumn("uuid", F.md5(F.concat_ws("|", "url", "chunk_idx")))
        .withColumn("name", F.concat_ws("#", "url", "chunk_idx"))
        # EpisodeType dispatch (nodes.py:42-75) detected from content
        # shape, never from generative corpus knowledge: a JSON object
        # chunk is a json episode, a 'Speaker: ...' chunk is a message
        # episode, anything else is text
        .withColumn(
            "source",
            F.expr(
                "CASE WHEN content LIKE '{%' THEN 'json'"
                " WHEN content RLIKE '^(?:Professor |Dr\\\\. )?[A-Z][a-z]+(?: [A-Z][a-z]+)*: '"
                " THEN 'message' ELSE 'text' END"
            ),
        )
        .withColumn("source_description", F.col("url"))
        .withColumn("valid_at", F.col("warc_ts"))
        .withColumn("created_at", F.col("warc_ts"))
    )
    return ep.select(
        "uuid",
        "name",
        "group_id",
        "source",
        "source_description",
        "content",
        "valid_at",
        "created_at",
        "url",
        "chunk_idx",
    )
