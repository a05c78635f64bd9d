"""End-to-end KG-construction pipeline (the Spark re-expression of
Graphiti.add_episode_bulk, /root/reference/graphiti_core/graphiti.py:493-604
— see SURVEY.md §3.2):

pages -> clean+chunk -> episodes -> {mentions, triples} -> entity
resolution -> pointer resolution -> edge dedup -> temporal invalidation ->
{nodes, edges, mentions} tables.

Unlike the reference's bulk path, invalidation IS performed batch-wide
(graphiti.py:526-528 documents the reference skipping it; its unit tests
require the semantics, so we keep them).

GraphTables is LAZY: each stage table is computed on first attribute
access and cached on the instance, so a consumer executes only its own
lineage — an episodes-only query (scan + explode) never pays extraction,
MinHash-LSH resolution, or the connected-components cutover action. This
is the DAG-shape analogue of Iceberg stage tables: downstream stages read
the committed upstream output; nothing runs until a stage is consumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.episodes import build_episodes
from ..operators.extract import extract_all, attach_labels, split_extracted
from ..operators.materialize import (
    build_mention_edges,
    invalidate_edges,
    materialize_edges,
    resolve_edge_pointers,
)
from ..operators.resolve import resolve_entities
from ..sources.pages import build_pages


def _materialize(df: DataFrame, root: str, name: str) -> DataFrame:
    """Stage commit: write the stage output to parquet and read it back.
    This is the single-job stand-in for the Iceberg stage tables of the
    production design (SURVEY.md §4 checkpoint/lineage): every downstream
    consumer reads the committed table instead of re-running the lineage,
    and a restarted job resumes from the last committed stage."""
    path = f"{root}/{name}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


class GraphTables:
    """Lazy stage container for the construction DAG.

    Attribute access materializes (and caches) the stage:

        pages -> episodes -> extracted -> {triples_raw, mentions_raw}
              -> {nodes, uuid_map} -> edges -> mention_edges

    Assigning to a stage attribute overrides it (the API mutation paths —
    remove_episodes / add_triplet — rewrite tables in place). Stages that
    are never read are never computed, so e.g. `t.episodes` runs one page
    scan, not the full resolution."""

    def __init__(
        self,
        pages: DataFrame,
        use_lsh: bool = True,
        materialize_dir: str | None = None,
        ontology=None,
    ):
        from ..ontology import DEFAULT

        self.pages = pages
        self._use_lsh = use_lsh
        self._materialize_dir = materialize_dir
        self.ontology = ontology or DEFAULT

    # -- stage builders (each runs at most once per instance) --------------

    def _build_episodes(self) -> DataFrame:
        return build_episodes(self.pages)

    def _build_extracted(self) -> DataFrame:
        # Extraction runs ONCE as a combined pass (triples + mention spans
        # in a single whole-stage-codegen projection — episode content is
        # scanned one time). Its skinny output is the fan-out point of the
        # DAG: committed to parquet when materialize_dir is given (the
        # Iceberg stage-table pattern, resumable via plans/lineage.py),
        # else persisted. Without this the multi-consumer lazy DAG
        # re-executes the extraction ~3x (measured 33s vs 13s at 2.25M
        # sentences on local[32]).
        extracted = extract_all(self.episodes)
        if self._materialize_dir:
            return _materialize(extracted, self._materialize_dir, "extracted")
        # DISK_ONLY + spark.local.dir on tmpfs = a shared-memory row store
        # without the columnar-encode CPU of the default MEMORY_AND_DISK
        # cache (measured 14.5s vs 20.8s for the flagship at 2.25M
        # sentences, local[32])
        from pyspark import StorageLevel

        return extracted.persist(StorageLevel.DISK_ONLY)

    def _commit(self, df: DataFrame, name: str) -> DataFrame:
        """Stage commit for a fan-out table consumed by several downstream
        subplans — often more than once inside a single action (e.g.
        triples_view references `edges` directly AND through the node
        summaries/attributes derivations, ~5 subplan copies). With
        materialize_dir this is a parquet stage table (the Iceberg
        pattern — at crawl scale the only option). WITHOUT it the copies
        are left to physical-plan exchange reuse: the identical shuffle
        subtrees dedup into ReusedExchange nodes, so the stage computes
        once per action with NO cache barrier — measured 39s vs 61s for
        the sf0.1 flagship versus a persist() here (the cache's columnar
        encode + its hard materialization barrier cost more than the
        exchange reuse saves)."""
        if self._materialize_dir:
            return _materialize(df, self._materialize_dir, name)
        import os

        mode = os.environ.get("SPARK_GRAFT_STAGE_COMMIT", "checkpoint")
        if mode == "none":
            return df
        if mode == "persist":
            return df.persist()
        return df.localCheckpoint(eager=True)

    def _build_triples_raw(self) -> DataFrame:
        return split_extracted(self.extracted)[0]

    def _build_mentions_raw(self) -> DataFrame:
        # committed: consumed by BOTH entity resolution and the MENTIONS
        # edge build — without a commit each consumer re-runs the
        # attach_labels projection over the 2x-exploded extraction
        # (measured ~3.5s per extra run at sf0.1 x20)
        triples_raw, spans = split_extracted(self.extracted)
        return self._commit(
            attach_labels(spans, triples_raw, self.ontology), "mentions_raw"
        )

    def _resolve(self) -> tuple[DataFrame, DataFrame]:
        """Entity resolution — runs once; caches BOTH outputs."""
        nodes, uuid_map = resolve_entities(self.mentions_raw, use_lsh=self._use_lsh)
        self.uuid_map = uuid_map
        self._base_nodes = nodes
        return nodes, uuid_map

    def _build_uuid_map(self) -> DataFrame:
        self._resolve()
        return self.uuid_map

    def _build__base_nodes(self) -> DataFrame:
        self._resolve()
        return self._base_nodes

    def _build_edges(self) -> DataFrame:
        # two-step commit: invalidate_edges references its input THREE
        # times (the contradiction self-join plus the final left join) and
        # physical-plan exchange reuse does NOT dedup the aggregation
        # under the differing filter/alias subtrees — uncommitted, the
        # 425k-row materialize groupBy executed ~3x (measured 7.2s -> 3.7s
        # at sf0.1 x20 with the intermediate commit)
        resolved = resolve_edge_pointers(self.triples_raw, self.uuid_map)
        mat = self._commit(materialize_edges(resolved, self.ontology), "edges_raw")
        return self._commit(invalidate_edges(mat), "edges")

    def _build_nodes(self) -> DataFrame:
        # final node table: content-derived summary (X15 — identity
        # sentence + the node's earliest facts, deterministic analogue of
        # the <=500-word LLM summary, prompts/summarize_nodes.py:48-125)
        # + derived typed attributes (X2/F14, operators/attributes.py)
        from ..operators.attributes import with_attributes
        from ..operators.summaries import with_summaries

        base, edges = self._base_nodes, self.edges
        return self._commit(
            with_attributes(with_summaries(base, edges), edges), "nodes"
        )

    def _build_mention_edges(self) -> DataFrame:
        return build_mention_edges(self.mentions_raw, self.uuid_map)

    def _build_episode_facts(self) -> DataFrame:
        # episodes.entity_edges (reference nodes.py:137-140, set by
        # graphiti.py:467 after edge resolution): the per-episode list of
        # resolved fact-edge uuids, inverted from the edges' provenance
        # arrays. One explode of the skinny (uuid, episodes) projection +
        # one groupBy on episode_uuid (partial-agg'd), left-joined so
        # fact-free episodes keep an empty list.
        ef = (
            self.edges.select("uuid", F.explode("episodes").alias("episode_uuid"))
            .groupBy("episode_uuid")
            .agg(F.array_sort(F.collect_set("uuid")).alias("entity_edges"))
        )
        return (
            self.episodes.join(
                ef, self.episodes["uuid"] == ef["episode_uuid"], "left"
            )
            .drop("episode_uuid")
            .withColumn(
                "entity_edges",
                F.coalesce(
                    F.col("entity_edges"), F.array().cast("array<string>")
                ),
            )
        )

    def _build_nodes_emb(self) -> DataFrame:
        # name_embedding materialized at BUILD time, exactly once per
        # graph (reference stores node.name_embedding at ingest —
        # nodes.py:262-269); search reads this table instead of
        # re-embedding the corpus per call. Persisted: it is a read-side
        # index, the Iceberg-embedding-table analogue.
        from ..functions.embed import with_embedding

        corpus = self.nodes.select(
            "uuid", F.concat_ws(" ", "name", "summary").alias("text")
        )
        return with_embedding(corpus, "text", "vec").persist()

    def _build_edges_emb(self) -> DataFrame:
        # fact_embedding at build time (reference edges.py:199-208)
        from ..functions.embed import with_embedding

        corpus = self.edges.select("uuid", F.col("fact").alias("text"))
        return with_embedding(corpus, "text", "vec").persist()

    _STAGES = frozenset(
        {
            "episodes",
            "extracted",
            "triples_raw",
            "mentions_raw",
            "uuid_map",
            "_base_nodes",
            "edges",
            "nodes",
            "mention_edges",
            "nodes_emb",
            "edges_emb",
            "episode_facts",
        }
    )

    # derived read-side indexes dropped when their base table is
    # overridden (API mutation paths assign t.nodes / t.edges directly)
    _DERIVED = {
        "nodes": ("nodes_emb",),
        "edges": ("edges_emb", "episode_facts"),
        "episodes": ("episode_facts",),
    }

    def __getattr__(self, name: str):
        # only reached when `name` is not in the instance dict: compute the
        # stage once, cache it as a plain attribute
        if name in GraphTables._STAGES:
            df = getattr(self, f"_build_{name}")()
            setattr(self, name, df)
            return df
        raise AttributeError(name)

    def __setattr__(self, name: str, value) -> None:
        for dep in GraphTables._DERIVED.get(name, ()):
            stale = self.__dict__.pop(dep, None)
            if stale is not None:
                stale.unpersist()
        object.__setattr__(self, name, value)


def build_graph(
    spark: SparkSession,
    sf_dir: str,
    use_lsh: bool = True,
    pages: DataFrame | None = None,
    replicate: int = 1,
    materialize_dir: str | None = None,
    ontology=None,
) -> GraphTables:
    """Declare the construction DAG over the input pages. Returns
    immediately — stages run when their tables are consumed. `ontology`
    (ontology.Ontology) customizes entity labels, predicate synonym
    classes (edge dedup) and contradictions — the reference's
    entity_types extension point (graphiti.py:264)."""
    pages = (
        pages
        if pages is not None
        else build_pages(
            spark, sf_dir, replicate=replicate, with_html=materialize_dir is None
        )
    )
    return GraphTables(
        pages, use_lsh=use_lsh, materialize_dir=materialize_dir, ontology=ontology
    )


def triples_view(tables: GraphTables) -> DataFrame:
    """The scored deliverable: (subj, pred, obj) with temporal validity —
    canonical display names joined back through the nodes table. The name
    join is left to AQE: the nodes table is O(distinct entities) — small
    at test scale (AQE converts to broadcast at runtime), but billions of
    rows at 10^12 documents, where a forced broadcast would OOM and
    sort-merge on the uuid keys is the correct plan (SURVEY.md §2.3 J1)."""
    n = tables.nodes.select(
        F.col("uuid").alias("node_uuid"), F.col("name").alias("node_name")
    )
    e = tables.edges
    return (
        e.join(
            n.withColumnRenamed("node_uuid", "source_node_uuid")
            .withColumnRenamed("node_name", "subj"),
            "source_node_uuid",
        )
        .join(
            n.withColumnRenamed("node_uuid", "target_node_uuid")
            .withColumnRenamed("node_name", "obj"),
            "target_node_uuid",
        )
        .select(
            "group_id",
            "subj",
            F.col("name").alias("pred"),
            "obj",
            "fact",
            "valid_at",
            "invalid_at",
            "episodes",
        )
    )
