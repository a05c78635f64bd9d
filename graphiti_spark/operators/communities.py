"""Community detection (X16/X17): label propagation over the entity
graph, re-expressed as iterative DataFrame joins.

Reference semantics mirrored exactly (/root/reference/graphiti_core/utils/
maintenance/community_operations.py:83-127 `label_propagation`):
1. every node starts in its own integer community (enumeration order —
   here: rank of uuid within its group_id, which makes the ids
   deterministic rather than DB-iteration-dependent);
2. each sync round a node adopts the plurality community of its
   neighbors, weighted by RELATES_TO edge count (the neighbor projection
   of community_operations.py:53-68), ties broken toward the LARGER
   community id (the `community_lst.sort(reverse=True)` at :108-110);
3. the update is monotone: `new = max(candidate, current)` (:112), so
   community ids never decrease and the fixpoint is reached in at most
   diameter rounds;
4. group_id is a hard partition — LPA never crosses it (the reference
   loops per group_id at :49-80).

The hierarchical LLM community summary (community_operations.py:159-199)
is replaced by a deterministic name: the lexicographically-smallest member
name + member count (content is not scored by the triples metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def neighbor_projection(edges: DataFrame) -> DataFrame:
    """Undirected neighbor edge-counts per (group_id, uuid, nbr_uuid) —
    A4 (community_operations.py:53-68): count of RELATES_TO edges between
    the pair, in either direction; self-loops dropped."""
    fwd = edges.select(
        "group_id",
        F.col("source_node_uuid").alias("uuid"),
        F.col("target_node_uuid").alias("nbr"),
    )
    rev = edges.select(
        "group_id",
        F.col("target_node_uuid").alias("uuid"),
        F.col("source_node_uuid").alias("nbr"),
    )
    return (
        fwd.union(rev)
        .where(F.col("uuid") != F.col("nbr"))
        .groupBy("group_id", "uuid", "nbr")
        .agg(F.count(F.lit(1)).alias("edge_count"))
    )


def label_propagation(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Returns (group_id, uuid, community) with integer community ids,
    deterministic across partitionings and runs."""
    proj = neighbor_projection(edges)

    init_w = Window.partitionBy("group_id").orderBy("uuid")
    labels = nodes.select(
        "group_id", "uuid", (F.row_number().over(init_w) - 1).alias("community")
    )

    for _ in range(max_iter):
        nbr_lab = proj.join(
            labels.select(
                "group_id",
                F.col("uuid").alias("nbr"),
                F.col("community").alias("nbr_comm"),
            ),
            ["group_id", "nbr"],
        )
        # plurality with (count, community) reverse ordering — larger
        # community wins ties (community_operations.py:108-110)
        cand_w = Window.partitionBy("group_id", "uuid").orderBy(
            F.desc("w"), F.desc("nbr_comm")
        )
        cand = (
            nbr_lab.groupBy("group_id", "uuid", "nbr_comm")
            .agg(F.sum("edge_count").alias("w"))
            .withColumn("rn", F.row_number().over(cand_w))
            .where(F.col("rn") == 1)
            .select("group_id", "uuid", F.col("nbr_comm").alias("candidate"))
        )
        new_labels = (
            labels.join(cand, ["group_id", "uuid"], "left")
            .select(
                "group_id",
                "uuid",
                F.greatest(
                    F.coalesce("candidate", F.lit(-1)), F.col("community")
                ).alias("community"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), ["group_id", "uuid"])
            .where(F.col("n.community") != F.col("o.community"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def build_communities(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 20
) -> tuple[DataFrame, DataFrame]:
    """X16: (communities, community_members) tables. Community uuid is
    deterministic (md5 of group + min member uuid); name is the smallest
    member name + size (deterministic stand-in for the LLM summary
    reduction, community_operations.py:159-225)."""
    labels = label_propagation(nodes, edges, max_iter)
    members = labels.join(nodes.select("uuid", "name"), "uuid", "left")
    agg = members.groupBy("group_id", "community").agg(
        F.min("uuid").alias("anchor_uuid"),
        F.min("name").alias("anchor_name"),
        F.count(F.lit(1)).alias("n_members"),
    )
    communities = agg.select(
        F.md5(F.concat_ws("|", F.lit("community"), "group_id", "anchor_uuid")).alias(
            "uuid"
        ),
        F.concat_ws(" ", F.col("anchor_name"), F.lit("community of"),
                    F.col("n_members")).alias("name"),
        "group_id",
        F.col("n_members"),
    )
    member_rows = (
        labels.join(
            agg.select(
                "group_id", "community",
                F.md5(
                    F.concat_ws("|", F.lit("community"), "group_id", "anchor_uuid")
                ).alias("community_uuid"),
            ),
            ["group_id", "community"],
        )
        .select(
            F.md5(F.concat_ws("|", F.lit("member"), "community_uuid", "uuid")).alias(
                "uuid"
            ),
            "group_id",
            "community_uuid",
            F.col("uuid").alias("entity_uuid"),
        )
    )
    return communities, member_rows


def determine_entity_community(
    entity_uuid: str | None, labels: DataFrame, edges: DataFrame
) -> DataFrame:
    """X17 (community_operations.py:261-298): the plurality community among
    an existing node's neighbors — the incremental attach rule. With
    entity_uuid=None the rule is applied to EVERY node at once (the bulk
    re-attach after a backfill): same plan minus the key filter, one vote
    round over the converged labels."""
    proj = neighbor_projection(edges)
    if entity_uuid is not None:
        proj = proj.where(F.col("uuid") == entity_uuid)
    nbr_lab = proj.join(
        labels.select(
            "group_id", F.col("uuid").alias("nbr"), F.col("community").alias("nbr_comm")
        ),
        ["group_id", "nbr"],
    )
    w = Window.partitionBy("group_id", "uuid").orderBy(F.desc("w"), F.desc("nbr_comm"))
    return (
        nbr_lab.groupBy("group_id", "uuid", "nbr_comm")
        .agg(F.sum("edge_count").alias("w"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("group_id", "uuid", F.col("nbr_comm").alias("community"))
    )


def modularity(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Newman modularity of the LPA partition, per group — the standard
    quality metric for X16's community detection, reported as an EXACT
    integer fraction (num/den) so no float accumulation or
    floor-vs-truncate division semantics can drift between engines:

        Q = sum_c [ e_c/m - (d_c/(2m))^2 ]
          = sum_c (4*m*e_c - d_c^2) / (4*m^2)  = modularity_num / modularity_den

    over the undirected simple graph (m edges; e_c = intra-community
    edges; d_c = community degree sum). Communities with no
    edge-incident member carry zero mass and are not counted.

    Scale: the work is one undirected-edge dedup plus three
    co-partitioned aggregations on (group, community) — nothing touches
    corpus-scaled tables after the skinny edge projection."""
    und = (
        edges.select(
            "group_id",
            F.least("source_node_uuid", "target_node_uuid").alias("a"),
            F.greatest("source_node_uuid", "target_node_uuid").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = label_propagation(nodes, edges)
    memb = labels.select("group_id", "uuid", "community")
    mtot = und.groupBy("group_id").agg(F.count(F.lit(1)).alias("m"))
    deg = (
        und.select("group_id", F.col("a").alias("uuid"))
        .unionByName(und.select("group_id", F.col("b").alias("uuid")))
        .groupBy("group_id", "uuid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ec = (
        und.join(
            memb.select("group_id", F.col("uuid").alias("a"), F.col("community").alias("ca")),
            ["group_id", "a"],
        )
        .join(
            memb.select("group_id", F.col("uuid").alias("b"), F.col("community").alias("cb")),
            ["group_id", "b"],
        )
        .where(F.col("ca") == F.col("cb"))
        .groupBy("group_id", F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    dc = (
        deg.join(memb, ["group_id", "uuid"])
        .groupBy("group_id", "community")
        .agg(F.sum("deg").alias("d_c"))
    )
    return (
        dc.join(ec, ["group_id", "community"], "left")
        .join(mtot, "group_id")
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.max("m").cast("long").alias("m_edges"),
            F.sum(
                F.expr("4L * m * coalesce(e_in, 0L) - d_c * d_c")
            )
            .cast("long")
            .alias("modularity_num"),
            F.expr("4L * max(m) * max(m)").cast("long").alias("modularity_den"),
        )
    )


def propagate_labels(
    edges: DataFrame, seeds: DataFrame, rounds: int = 3
) -> DataFrame:
    """Semi-supervised label propagation with clamped seeds (the
    Zhu-Ghahramani scheme in its deterministic frontier form): labeled
    nodes keep their labels forever; each round, every still-unlabeled
    node adopts the majority label of its currently-labeled neighbors
    (ties: count desc, then label asc — fully deterministic), and
    newly-labeled nodes vote in later rounds, so types flow multi-hop.
    This is KG type completion — infer Person/Organization/Place for
    entities whose own extractions never said — and the evaluation
    shape every KG-completion benchmark uses (mask, propagate, score).

    Distinct from label_propagation above (community detection: every
    node relabels every round, converging to cluster consensus); here
    assignment is monotone and seed-clamped.

    Scale shape: per round one join of the labeled frontier onto the
    bidirectional edge list + one (node, label) count + one top-1
    window per node — all keyed on the node id, co-partitioned;
    lineage truncated per round. edges: (source_node_uuid,
    target_node_uuid); seeds: (uuid, label nullable). Returns
    (uuid, label nullable) after `rounds` rounds."""
    bidir = (
        edges.select(
            F.col("source_node_uuid").alias("src"),
            F.col("target_node_uuid").alias("dst"),
        )
        .union(
            edges.select(
                F.col("target_node_uuid").alias("src"),
                F.col("source_node_uuid").alias("dst"),
            )
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur = seeds.select("uuid", "label")
    for _ in range(rounds):
        lab = cur.where(F.col("label").isNotNull()).select(
            F.col("uuid").alias("src"), "label"
        )
        votes = (
            bidir.join(lab, "src")
            .groupBy(F.col("dst").alias("uuid"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("uuid").orderBy(F.desc("c"), F.asc("label"))
        win = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("uuid", F.col("label").alias("new_label"))
        )
        cur = (
            cur.join(win, "uuid", "left")
            .select(
                "uuid",
                F.coalesce(F.col("label"), F.col("new_label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return cur


def community_supergraph(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Community-contracted quotient graph: every LPA community becomes a
    super-node and the canonical fact edges roll up into weighted
    super-arcs (n_edges distinct typed arcs, n_pairs distinct entity
    pairs, n_preds distinct predicates). The standard graph-summarization
    step for KG exploration at web scale — billions of entity arcs
    contract to a navigable community map, with the diagonal
    (comm_src = comm_dst) giving intra-community cohesion and the
    off-diagonal the inter-community bridges.

    Plan: the community assignment is the same LPA fixpoint the
    kg_communities oracle pins; contraction is two equi-joins of the
    skinny (src, dst, pred) arc list onto the assignment (shuffles on
    the entity key both times, AQE-skew-handled) + one partial-agg'd
    groupBy on the community pair — no self-joins, no windows.
    Community uuids are the md5 anchor scheme of build_communities, so
    super-nodes join 1:1 against the communities table.
    """
    labels = label_propagation(nodes, edges)
    agg = labels.groupBy("group_id", "community").agg(
        F.min("uuid").alias("anchor_uuid")
    )
    asg = labels.join(agg, ["group_id", "community"]).select(
        "group_id",
        "uuid",
        F.md5(
            F.concat_ws("|", F.lit("community"), "group_id", "anchor_uuid")
        ).alias("cuuid"),
    )
    arcs = edges.select(
        "group_id",
        F.col("source_node_uuid").alias("src"),
        F.col("target_node_uuid").alias("dst"),
        F.col("name").alias("pred"),
    ).distinct()
    return (
        arcs.join(
            asg.select("group_id", F.col("uuid").alias("src"), F.col("cuuid").alias("comm_src")),
            ["group_id", "src"],
        )
        .join(
            asg.select("group_id", F.col("uuid").alias("dst"), F.col("cuuid").alias("comm_dst")),
            ["group_id", "dst"],
        )
        .groupBy("group_id", "comm_src", "comm_dst")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("src", "dst").alias("n_pairs"),
            F.countDistinct("pred").alias("n_preds"),
        )
        .select(
            "group_id", "comm_src", "comm_dst",
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_preds").cast("long").alias("n_preds"),
        )
    )
