"""Sweep every queries() entry's final schema for top-level complex-typed
columns (ARRAY/MAP/STRUCT). The driver's correctness canonicalizer runs
pandas sort_values over raw result columns; list/dict cells are unhashable
and crash it (r4: kg_global_conflicts). Zero complex top-level columns is
the invariant this tool enforces.

Usage: python tools/schema_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import ArrayType, MapType, StructType  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", sf_dir)

    import __spark_entry__ as e
    from graphiti_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    bad: list[tuple[str, str, str]] = []
    qs = e.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    if bad:
        for name, col, typ in bad:
            print(f"COMPLEX  {name}.{col}: {typ}")
        print(f"{len(bad)} complex top-level columns across {len(qs)} queries")
        return 1
    print(f"OK: 0 complex top-level columns across {len(qs)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
