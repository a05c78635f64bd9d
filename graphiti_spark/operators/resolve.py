"""Entity resolution at scale (X5/X6/X7 + F16 + J1).

graphiti resolves each extracted node against LSH-free LLM-judged candidate
lists, one episode at a time (/root/reference/graphiti_core/utils/
maintenance/node_operations.py:298-412; bulk_utils.py:243-327 for the
recursive sqrt-chunk batch variant). The distributed redesign (per the
north rule):

1. **blocking** — exact key: normalized entity name (lowercase, honorific
   and corporate-suffix stripped); fuzzy key: MinHash-LSH bands over char
   3-gram shingles of the normalized name;
2. **match-edge list** — candidate pairs from a block are verified
   (exact-norm pairs are matches by definition; LSH pairs verified by
   Jaccard >= threshold inside applyInPandas);
3. **connected components** over the match edges (iterative min-label
   propagation — GraphFrames-free), canonical uuid = min(uuid) per
   component. This reproduces graphiti's order-dependent "first wins"
   (bulk_utils.py:246-249) with a deterministic total order;
4. **uuid_map broadcast join** to remap edge pointers
   (resolve_edge_pointers, bulk_utils.py:367-374 → J1).

Skew note (100 TB): blocking keys are salted only for the *candidate
verification* stage; the CC edge list is tiny relative to the corpus
(only names that collide), and AQE skew-join handles hot names like
"John Smith" at crawl scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

# --- MinHash parameters (deterministic hash family) -----------------------
# 16 bands x 2 rows: candidate recall at the verification threshold is
# effectively 1 (P(miss) = (1 - J^2)^16 ~ 2e-6 at J=0.75) — required
# because the driver's oracle gate treats fuzzy resolution as exact truth.
# The wider banding admits more low-J candidates than 8x4 would; the
# Jaccard verification step is the precision guard (and the corpus's
# cross-entity ceiling is J=0.2, far under threshold).
N_HASHES = 32
LSH_BANDS = 16
LSH_ROWS = N_HASHES // LSH_BANDS
_MERSENNE = (1 << 61) - 1
_RNG = np.random.RandomState(42)
_A = _RNG.randint(1, _MERSENNE, size=N_HASHES, dtype=np.int64)
_B = _RNG.randint(0, _MERSENNE, size=N_HASHES, dtype=np.int64)


def char_shingles(name: str, n: int = 3) -> set[str]:
    s = f"^{name}$"
    return {s[i : i + n] for i in range(max(1, len(s) - n + 1))}


def _shingle_hashes(name: str) -> np.ndarray:
    import zlib

    return np.array(
        [zlib.crc32(sh.encode("utf-8")) for sh in char_shingles(name)],
        dtype=np.int64,
    )


def minhash_signature(name: str) -> np.ndarray:
    h = _shingle_hashes(name)
    # (a*x + b) mod p for the whole family at once
    sig = ((_A[None, :] * h[:, None] + _B[None, :]) % _MERSENNE).min(axis=0)
    return sig


def jaccard(a: str, b: str) -> float:
    sa, sb = char_shingles(a), char_shingles(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def distinct_entities(mentions: DataFrame) -> DataFrame:
    """Distinct (group_id, name) with deterministic display uuid and the
    label chosen by global plurality vote (count desc, label asc)."""
    votes = (
        mentions.groupBy("group_id", "name", "norm_name", "label")
        .count()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("group_id", "name").orderBy(
                    F.desc("count"), F.asc("label")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn", "count")
    )
    return votes.withColumn(
        "uuid", F.md5(F.concat_ws("|", F.lit("node"), "group_id", "name"))
    )


def match_edges_exact(entities: DataFrame) -> DataFrame:
    """Match edges from the exact normalized-name block: every member links
    to the block minimum (star edges — enough for CC correctness)."""
    w = Window.partitionBy("group_id", "norm_name")
    return (
        entities.withColumn("dst", F.min("uuid").over(w))
        .where(F.col("uuid") != F.col("dst"))
        .select(F.col("uuid").alias("src"), "dst")
    )


def match_edges_lsh(
    entities: DataFrame, threshold: float = 0.6, n_salt: int = 1
) -> DataFrame:
    """Fuzzy match edges: MinHash-LSH banding over normalized names, then
    exact Jaccard verification per candidate pair (applyInPandas)."""

    def sig_gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"uuid": [], "group_id": [], "norm_name": [], "band": [], "bucket": []}
                )
                continue
            sigs = np.stack([minhash_signature(nm) for nm in pdf["norm_name"]])
            rows = []
            for band in range(LSH_BANDS):
                chunk = sigs[:, band * LSH_ROWS : (band + 1) * LSH_ROWS]
                bucket = pd.util.hash_array(
                    np.ascontiguousarray(chunk).view([("", np.int64)] * LSH_ROWS).ravel()
                ).astype(np.int64)
                rows.append(
                    pd.DataFrame(
                        {
                            "uuid": pdf["uuid"].to_numpy(),
                            "group_id": pdf["group_id"].to_numpy(),
                            "norm_name": pdf["norm_name"].to_numpy(),
                            "band": np.int32(band),
                            "bucket": bucket,
                        }
                    )
                )
            yield pd.concat(rows, ignore_index=True)

    import pyspark.sql.types as T

    sig_schema = T.StructType(
        [
            T.StructField("uuid", T.StringType()),
            T.StructField("group_id", T.StringType()),
            T.StructField("norm_name", T.StringType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )
    sigs = entities.select("uuid", "group_id", "norm_name").mapInPandas(
        sig_gen, schema=sig_schema
    )

    a = sigs.alias("a")
    b = sigs.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.group_id") == F.col("b.group_id"))  # group is a hard partition (nodes.py:81)
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.uuid") < F.col("b.uuid")),
        )
        .select(
            F.col("a.uuid").alias("src"),
            F.col("b.uuid").alias("dst"),
            F.col("a.norm_name").alias("name_a"),
            F.col("b.norm_name").alias("name_b"),
        )
        .dropDuplicates(["src", "dst"])
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf[["src", "dst"]]
                continue
            keep = [
                jaccard(x, y) >= threshold
                for x, y in zip(pdf["name_a"], pdf["name_b"])
            ]
            yield pdf.loc[keep, ["src", "dst"]]

    out_schema = T.StructType(
        [T.StructField("src", T.StringType()), T.StructField("dst", T.StringType())]
    )
    return pairs.mapInPandas(verify, schema=out_schema)


def _local_components(edges: DataFrame) -> DataFrame:
    """Driver-side union-find over a SMALL match-edge list. The alias
    graph is orders of magnitude smaller than the corpus (only colliding
    distinct names appear), so below the threshold the iterative
    distributed fixpoint — whose cost is per-round scheduling latency, not
    data — is replaced by one collect + union-find + broadcast-back, the
    same small-graph cutover GraphX-style CC implementations use. Returns
    (id, component=min member id) for ids touched by any edge; untouched
    vertices keep themselves via the caller's coalesce."""
    pairs = edges.select("src", "dst").collect()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["src"]), find(r["dst"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    roots: dict[str, str] = {}
    comp: dict[str, str] = {}
    for x in set(parent) | {r["src"] for r in pairs} | {r["dst"] for r in pairs}:
        root = find(x)
        comp[x] = min(roots.get(root, x), x)
        roots[root] = comp[x]
    rows = [(x, roots[find(x)]) for x in comp]
    spark = edges.sparkSession
    if not rows:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [], T.StructType([T.StructField("id", T.StringType()),
                              T.StructField("component", T.StringType())])
        )
    return spark.createDataFrame(rows, ["id", "component"])


LOCAL_CC_THRESHOLD = 1_000_000


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Min-label propagation to fixpoint. vertices: (id). edges: (src, dst)
    undirected. Returns (id, component). Iterations are bounded by graph
    diameter; alias-resolution graphs are star-shaped so this converges in
    1-2 rounds; checkpointing via localCheckpoint truncates lineage."""
    # adaptive small-graph cutover: the match-edge list is tiny relative
    # to the corpus (distinct colliding names only) — count it, and solve
    # locally when it fits; the distributed fixpoint below is the
    # arbitrarily-large-graph path
    edges = edges.persist()
    if edges.count() <= LOCAL_CC_THRESHOLD:
        local = _local_components(edges)
        edges.unpersist()
        return vertices.join(local, "id", "left").select(
            "id", F.coalesce("component", "id").alias("component")
        )

    labels = vertices.select(F.col("id"), F.col("id").alias("component"))
    bidir = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    for _ in range(max_iter):
        nbr = (
            bidir.join(labels, bidir.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", "component")
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def resolve_entities(
    mentions: DataFrame, use_lsh: bool = True, lsh_threshold: float = 0.6
) -> tuple[DataFrame, DataFrame]:
    """Returns (nodes, uuid_map).

    nodes: canonical entity table (uuid, name, group_id, labels, n_aliases,
           n_mentions, created_at-free — timestamps added at materialize).
    uuid_map: (group_id, name, uuid, canon_uuid) for pointer resolution.
    """
    ents = distinct_entities(mentions).cache()

    star = match_edges_exact(ents)
    if use_lsh:
        star = star.union(match_edges_lsh(ents, threshold=lsh_threshold))
        comp = connected_components(star, ents.select(F.col("uuid").alias("id")))
        mapped = ents.join(
            comp.withColumnRenamed("id", "uuid"), "uuid", "left"
        ).withColumn("canon_uuid", F.coalesce("component", "uuid"))
    else:
        # exact blocking: component = min uuid per (group_id, norm_name) —
        # single shuffle, no iteration needed
        w = Window.partitionBy("group_id", "norm_name")
        mapped = ents.withColumn("canon_uuid", F.min("uuid").over(w))

    uuid_map = mapped.select("group_id", "name", "norm_name", "uuid", "canon_uuid")

    # canonical display name: shortest, then lexicographic (deterministic
    # analogue of the LLM "pick the best full name" in dedupe_nodes.py:47-91)
    name_key = F.concat(F.lpad(F.length("name"), 4, "0"), F.col("name"))
    nodes = (
        mapped.groupBy("group_id", "canon_uuid")
        .agg(
            F.min_by("name", name_key).alias("name"),
            F.array_sort(F.collect_set("label")).alias("labels"),
            F.count(F.lit(1)).alias("n_aliases"),
        )
        .withColumnRenamed("canon_uuid", "uuid")
    )
    return nodes, uuid_map
