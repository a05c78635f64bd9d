"""Generate the adversarial-skew corpus fixture the north rule names
(hot-domain skew): a variant of a driver sf-dir whose documents table has

- **domain skew**: ~45% of all docs re-assigned to ONE hot source
  ('src0' -> group_id 'src0' downstream), so every group-keyed stage
  (episode windows, per-group aggregations, LSH bands scoped by group)
  sees a dominant key; and
- **entity skew**: the hot docs' doc_ids all sit in one residue class
  mod 96, which pins the corpus generator's template/person/org/place
  index arithmetic (corpus.sentence_fields: pi, oi, li, t and d%4 are
  all mod-96-periodic) — every hot doc renders the SAME few entities, so
  a handful of names reach extreme frequency. Surface forms still vary
  (typo d%13, honorific d%7, org-suffix d%5 are NOT mod-96-periodic), so
  MinHash-LSH resolution does real work on the flooded names, and the
  hot template sequence includes the EMPLOYED_AT / NO_LONGER_WORKS_AT
  contradiction pair, so temporal invalidation also runs against the
  skewed keys.

Because the skew lives entirely in documents.parquet (the shared input of
the Spark pipeline, the pandas golden generator, and the DuckDB oracle
SQL), the full 168-query correctness gate runs UNCHANGED on the fixture
directory: every other table is symlinked from the source sf dir.

Usage: python tools/make_skew_fixture.py [src_sf_dir] [dst_dir] [hot_frac]
Defaults: /root/testdata/sf0.1 -> fixtures/skew0.1, hot_frac=0.45.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# hot doc_ids alternate between TWO residue classes mod 96 (both far above
# any driver doc_id, so hot/cold ids never collide). 96 = lcm(32, 12, 4, 2)
# covers the person-index halving, template modulus, sentence count and org
# parity in corpus.sentence_fields, so each class renders a FIXED small
# entity set. The classes are chosen adversarially: class 1 (residue 1)
# emits NO_LONGER_WORKS_AT on exactly the (person, org) pair that class 2
# (residue 21) asserts EMPLOYED_AT on, so temporal invalidation fires
# INSIDE the hot group, on the flooded keys.
HOT_BASE = 960_001      # residue 1 mod 96
HOT_BASE2 = 960_021     # residue 21 mod 96
HOT_SOURCE = "src0"


def hot_doc_ids(n: int) -> list[int]:
    return [
        (HOT_BASE if i % 2 == 0 else HOT_BASE2) + 96 * (i // 2)
        for i in range(n)
    ]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
]


def make_fixture(src: str, dst: str, hot_frac: float = 0.45) -> dict:
    os.makedirs(dst, exist_ok=True)
    docs = pq.read_table(os.path.join(src, "documents.parquet")).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    n_hot = int(len(docs) * hot_frac)
    hot = docs.iloc[:n_hot].copy()
    cold = docs.iloc[n_hot:].copy()
    hot["doc_id"] = hot_doc_ids(len(hot))
    hot["source"] = HOT_SOURCE
    out = (
        pa.Table.from_pandas(
            __import__("pandas").concat([hot, cold], ignore_index=True),
            preserve_index=False,
        )
    )
    pq.write_table(out, os.path.join(dst, "documents.parquet"))
    for t in TABLES:
        link = os.path.join(dst, f"{t}.parquet")
        target = os.path.join(src, f"{t}.parquet")
        if os.path.lexists(link):
            os.unlink(link)
        if os.path.exists(target):
            os.symlink(target, link)
    return {"dst": dst, "n_docs": len(docs), "n_hot": n_hot,
            "hot_source": HOT_SOURCE, "hot_base": HOT_BASE}


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "fixtures", "skew" + os.path.basename(src.rstrip("/")).removeprefix("sf")
    )
    frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.45
    print(make_fixture(src, dst, frac))
