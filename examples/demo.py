"""End-to-end demo: build the knowledge graph from a page corpus, run
the flagship deliverable, search it, and read the analytics tables.

    python examples/demo.py [sf_dir]    # default /root/testdata/sf0.001

Mirrors what a reference (graphiti) user does — add episodes, search,
retrieve — expressed as the batch/analytics surface of this engine."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from graphiti_spark.api import GraphitiSpark, SearchConfig
    from graphiti_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    g = GraphitiSpark(spark)
    g.build(sf_dir)  # build_graph: lazy stage DAG

    print("== canonical triples (flagship deliverable) ==")
    g.triples().orderBy("group_id", "subj", "pred", "obj").show(
        8, truncate=60
    )

    print("== hybrid search: BM25 + cosine, RRF-fused ==")
    g.search(
        ["works at"], config=SearchConfig(scope="edges", limit=5)
    ).show(truncate=60)

    print("== entity importance (integer PageRank) ==")
    from graphiti_spark.operators.centrality import pagerank

    pagerank(g.triples()).orderBy(
        "rank_u", ascending=False
    ).show(5)

    print("== communities ==")
    communities, _members = g.build_communities()
    communities.orderBy("n_members", ascending=False).show(5, truncate=60)

    print("== fact timeline for one entity ==")
    from graphiti_spark.operators.search import entity_timeline

    tl = entity_timeline(g.triples())
    first = tl.select("name").orderBy("name").limit(1).collect()[0]["name"]
    tl.where(tl.name == first).orderBy("seq").show(truncate=60)


if __name__ == "__main__":
    main()
