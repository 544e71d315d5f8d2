"""Local replica of the driver's correctness gate: run each registry query on
Spark and its DuckDB oracle side-by-side at sf0.01, compare row count, sorted
column names, per-column TYPES, and the order-insensitive multiset of values.

The type check exists because the driver hashes values together with their
Arrow types: a DuckDB HUGEINT (windowed SUM of integers) or DECIMAL output
hash-mismatches a Spark BIGINT/DOUBLE even when ``str()`` of every value
agrees — the `simhash16` (round 1) / `sessionize_events` (round 2) failure
class.  Both sides' schemas are canonicalized and compared per column, so an
uncast SUM fails here before it fails in the driver (canary-tested in
tests/test_operators.py::TestOracleValidator).

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


def canon_arrow_type(t) -> str:
    """Canonical label for a pyarrow type (the driver-side hash alphabet)."""
    import pyarrow as pa

    s = str(t)
    if s.startswith("decimal"):
        return "decimal"          # DuckDB HUGEINT / DECIMAL — always flagged
    if pa.types.is_integer(t):
        return "int64" if t.bit_width == 64 else "int32"
    if pa.types.is_floating(t):
        return "float64" if s == "double" else "float32"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        return f"list<{canon_arrow_type(t.value_type)}>"
    return s


def canon_spark_type(t) -> str:
    """Canonical label for a Spark DataType, same alphabet as Arrow's."""
    from pyspark.sql import types as T

    if isinstance(t, T.LongType):
        return "int64"
    if isinstance(t, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int32"
    if isinstance(t, T.DoubleType):
        return "float64"
    if isinstance(t, T.FloatType):
        return "float32"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, T.ArrayType):
        return f"list<{canon_spark_type(t.elementType)}>"
    return t.simpleString()


def compare_query(spark, con, spec, sf_dir=SF_DIR):
    """Run one registry query both ways; return (ok: bool, msg: str).

    Importable so the pytest canary can assert that an injected uncast
    windowed SUM (HUGEINT) or a type-drifted oracle actually fails.
    """
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_types = {f.name: canon_spark_type(f.dataType) for f in sdf.schema.fields}
    s_rows = [tuple(r) for r in sdf.collect()]
    # one DuckDB execution: the Arrow table carries both schema and rows
    tbl = con.execute(spec.oracle).arrow()
    d_cols = list(tbl.schema.names)
    d_rows = list(zip(*[c.to_pylist() for c in tbl.columns])) if tbl.num_columns else []
    d_types = {f.name: canon_arrow_type(f.type) for f in tbl.schema}

    type_mismatch = [
        f"{c}: spark={s_types[c]} duckdb={d_types[c]}"
        for c in s_types
        if c in d_types and s_types[c] != d_types[c]
    ]
    if type_mismatch:
        return False, (
            "column TYPE mismatch (driver's type-aware hash will fail even "
            "if values stringify identically — CAST in the oracle SQL): "
            + "; ".join(type_mismatch))

    sc, sr = normalize_rows(s_cols, s_rows)
    dc, dr = normalize_rows(d_cols, d_rows)
    if sc != dc:
        return False, f"column mismatch spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return False, f"row count spark={len(sr)} duckdb={len(dr)}"
    if sr != dr:
        n = sum(1 for a, b in zip(sr, dr) if a != b)
        diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        return False, f"value mismatch ({n} rows); first: {diff}"
    return True, f"{len(sr)} rows match"


def open_duckdb(sf_dir=SF_DIR):
    import duckdb

    from anycrawl_spark.operators.queries import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}')")
    return con


def main():
    from pyspark.sql import SparkSession

    from anycrawl_spark.operators.queries import REGISTRY

    names = sys.argv[1:] or [n for n, s in REGISTRY.items() if s.oracle]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = open_duckdb()

    failures = 0
    for name in names:
        spec = REGISTRY[name]
        if spec.oracle is None:
            print(f"  {name}: rows-only (no oracle) — skipped")
            continue
        try:
            ok, msg = compare_query(spark, con, spec)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        if ok:
            print(f"✓ {name}: {msg}")
        else:
            print(f"✗ {name}: {msg}")
            failures += 1

    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
