"""Spark StructTypes for every table in the engine (SURVEY.md §1.3).

One schema per reference Pydantic model (/root/reference/graphiti_core/
nodes.py:78-502, edges.py:41-463), plus the input pages table from
BASELINE.json's input_hint.
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDING_DIM = 1024  # reference: graphiti_core/embedder/client.py:22

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), True),
    ]
)

# EpisodicNode (nodes.py:130-141); uuid is deterministic (md5 of url#chunk)
# instead of uuid4 (nodes.py:79) for idempotent re-runs.
EPISODES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("source_description", T.StringType(), True),
        T.StructField("content", T.StringType(), False),
        T.StructField("valid_at", T.TimestampType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
    ]
)

# raw extracted mention (pre-resolution EntityNode, nodes.py:255-260)
MENTIONS_RAW = T.StructType(
    [
        T.StructField("episode_uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("norm_name", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("valid_at", T.TimestampType(), False),
    ]
)

# raw extracted triple (pre-resolution EntityEdge, edges.py:181-197)
TRIPLES_RAW = T.StructType(
    [
        T.StructField("episode_uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("sent_idx", T.IntegerType(), False),
        T.StructField("subj_name", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_name", T.StringType(), False),
        T.StructField("fact", T.StringType(), False),
        T.StructField("valid_at", T.TimestampType(), True),
        T.StructField("invalid_at", T.TimestampType(), True),
        T.StructField("warc_ts", T.TimestampType(), False),
    ]
)

NODES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), False),
        T.StructField("summary", T.StringType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("name_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("source_node_uuid", T.StringType(), False),
        T.StructField("target_node_uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("fact", T.StringType(), False),
        T.StructField("fact_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("episodes", T.ArrayType(T.StringType()), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("expired_at", T.TimestampType(), True),
        T.StructField("valid_at", T.TimestampType(), True),
        T.StructField("invalid_at", T.TimestampType(), True),
    ]
)

# EpisodicEdge / MENTIONS (edges.py:77-91)
MENTIONS_EDGES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("episode_uuid", T.StringType(), False),
        T.StructField("entity_uuid", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

COMMUNITIES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("summary", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

COMMUNITY_MEMBERS = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("community_uuid", T.StringType(), False),
        T.StructField("entity_uuid", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)
