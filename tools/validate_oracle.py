"""Local replica of the driver's correctness gate: run each registry query on
Spark and its DuckDB oracle side-by-side at sf0.01, compare row count, sorted
column names, and the order-insensitive multiset of values.

Usage: python tools/validate_oracle.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = repr(round(v, 9))
            elif v is None:
                v = "<null>"
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    import duckdb
    from pyspark.sql import SparkSession

    from anycrawl_spark.operators.queries import REGISTRY, TABLES

    names = sys.argv[1:] or [n for n, s in REGISTRY.items() if s.oracle]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = 0
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            print(f"  {name}: rows-only (no oracle) — skipped")
            continue
        try:
            sdf = spec.fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rel = con.execute(spec.oracle)
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
            # The driver hashes values together with their (Arrow) types, so
            # a DuckDB HUGEINT (windowed SUM of integers) or DECIMAL output
            # hash-mismatches a Spark BIGINT/DOUBLE even when str() agrees.
            # Surface that here instead of letting str() mask it.
            arrow_schema = con.execute(spec.oracle).arrow().schema
            bad_types = [
                f"{f.name}:{f.type}"
                for f in arrow_schema
                if "decimal" in str(f.type)
            ]
            if bad_types:
                print(
                    f"✗ {name}: oracle emits decimal-typed columns "
                    f"{bad_types} (DuckDB HUGEINT/DECIMAL) — the driver's "
                    f"type-aware hash will mismatch; CAST AS BIGINT/DOUBLE "
                    f"in the oracle SQL"
                )
                failures += 1
                continue
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: EXCEPTION {type(e).__name__}: {e}")
            failures += 1
            continue

        sc, sr = normalize_rows(s_cols, s_rows)
        dc, dr = normalize_rows(d_cols, d_rows)
        if sc != dc:
            print(f"✗ {name}: column mismatch spark={sc} duckdb={dc}")
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"✗ {name}: row count spark={len(sr)} duckdb={len(dr)}")
            failures += 1
            continue
        if sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"✗ {name}: value mismatch ({sum(1 for a, b in zip(sr, dr) if a != b)} rows); first: {diff}")
            failures += 1
            continue
        print(f"✓ {name}: {len(sr)} rows match")

    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
