"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark and
its ``oracle_sql()`` twin in DuckDB over the same parquet, compares
row counts and order-insensitive values (floats rounded to 9dp before
compare, mirroring a value-hash check's sensitivity).

Usage: python scripts/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


# Column-type strictness: the driver's value hash is computed over the
# Arrow representation, so DuckDB HUGEINT (int128) vs Spark BIGINT
# (int64) mismatches even when the Python values compare equal. Map
# both engines' declared types to a common vocabulary and fail on any
# difference — this is exactly the class of bug the round-1 hash
# failures were.
_SPARK_TY = {
    "tinyint": "int", "smallint": "int", "int": "int",
    "bigint": "int", "float": "float32", "double": "float64",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "binary": "bytes",
}
_DUCK_TY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
    "BIGINT": "int", "HUGEINT": "int128", "UTINYINT": "int",
    "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float32", "DOUBLE": "float64", "VARCHAR": "str",
    "BOOLEAN": "bool", "DATE": "date", "TIMESTAMP": "timestamp",
    "BLOB": "bytes", "NUMBER": "float64",
}


def _spark_tyname(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "decimal"
    return _SPARK_TY.get(dt, dt)


def _duck_tyname(t) -> str:
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    return _DUCK_TY.get(s, s.lower())


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    # None-safe total order (NULLs sort by type-name first)
    key = (lambda r: tuple((v is None, type(v).__name__, str(v))
                           for v in r))
    return sorted(cols), sorted(out, key=key)


def main():
    import __spark_entry__ as entrymod
    from pdf_table_spark.spark.session import build_session

    only = set(sys.argv[1:])
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = build_session("correctness", master="local[8]",
                          shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_types = {c: _spark_tyname(t) for c, t in sdf.dtypes}
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = {c: _duck_tyname(t)
                       for c, t in zip(rel.columns, rel.types)}
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ty_diff = {c: (s_types[c], d_types[c]) for c in s_types
                   if c in d_types and s_types[c] != d_types[c]}
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if ty_diff:
            print(f"FAIL  {name}: column types differ (spark, duckdb): "
                  f"{ty_diff}")
            n_fail += 1
        elif sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(dr)}")
            n_fail += 1
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
