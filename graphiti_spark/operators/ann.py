"""Similarity search over an embedding column (`array<float>`).

Two paths, mirroring the engine's entity-resolution scoring needs
(reference cosine scoring: /root/reference/graphiti_core/utils/
bulk_utils.py:269-272, search_utils.py:832-833 and the Cypher
`vector.similarity.cosine` calls at search_utils.py:239,415,558):

- `brute_force_topk`: exact cosine top-k — broadcast the (small) query set
  against the candidate table; dot product via `zip_with`/`aggregate`
  higher-order functions so the whole scoring stage stays JVM-side.
- `ivf_topk`: the scale path — a one-level IVF index: candidates are
  assigned to their nearest of `n_cells` deterministic centroid rows, the
  query probes its `n_probe` nearest cells, and scoring only touches those
  partitions. At 100 TB the cell assignment is the partition key, so each
  probe is a partition-pruned scan instead of a full pass.

Cosine here is dot/(|a|*|b|) accumulated left-to-right in float64, which
is bit-identical to DuckDB's list_cosine_similarity on the same input —
that equivalence is what the driver's oracle check exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def read_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.expr(
        f"sqrt(aggregate({a}, cast(0.0 as double),"
        " (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )


def with_cosine(pairs: DataFrame, a: str = "qe", b: str = "ce") -> DataFrame:
    return pairs.withColumn("score", _dot(a, b) / (_norm(a) * _norm(b)))


def brute_force_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors. queries: (q_id, qe). candidates:
    (c_id, ce). Queries are broadcast (the small dim side)."""
    pairs = candidates.crossJoin(F.broadcast(queries))
    scored = with_cosine(pairs)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "c_id", "score")
    )


def ivf_assign(candidates: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each candidate to its nearest centroid (cell). centroids:
    (cell_id, ce_centroid) — always broadcast-small."""
    pairs = candidates.crossJoin(F.broadcast(centroids))
    scored = pairs.withColumn(
        "cscore", _dot("ce", "ce_centroid") / (_norm("ce") * _norm("ce_centroid"))
    )
    w = Window.partitionBy("c_id").orderBy(F.desc("cscore"), F.asc("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c_id", "ce", "cell_id")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-pruned approximate top-k: score only candidates living in the
    query's `n_probe` nearest cells. Recall < 1 by design; the pytest
    harness checks recall vs `brute_force_topk` instead of an SQL oracle."""
    assigned = ivf_assign(candidates, centroids)
    qcells = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn(
            "cscore", _dot("qe", "ce_centroid") / (_norm("qe") * _norm("ce_centroid"))
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("cscore"), F.asc("cell_id"))
            ),
        )
        .where(F.col("rn") <= n_probe)
        .select("q_id", "qe", "cell_id")
    )
    pairs = assigned.join(qcells, "cell_id")
    scored = with_cosine(pairs)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "c_id", "score")
    )
