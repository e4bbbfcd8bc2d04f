"""Self-check harness mirroring the driver's CORRECTNESS gate:

runs every ``__spark_entry__.queries()`` entry at sf=0.01 on Spark, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet, and compares
row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage: PYTHONPATH=/root/repo python scripts/check_oracle.py [q01 q05 ...]

Env: ORACLE_SF_DIR (default /root/testdata/sf0.01) — the round-4 protocol
also runs one pass at sf0.1 (the bench scale factor) to catch scale-
dependent divergence (overflow, window edges) the sf0.01 gate can't see;
ORACLE_JSON_OUT — write a CORRECTNESS_r{N}.json-shaped artifact.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from quickner_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_value(v):
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return "1" if v else "0"
    return str(v)


# --- canonical type comparison -------------------------------------------
# The driver's hash is TYPE-sensitive (round-4 verdict: q41/q42/q48 went
# red on DuckDB HUGEINT sums vs Spark bigint with identical values), while
# the stringified value hash above is not. Map both engines' column types
# to one canonical vocabulary and fail on mismatch, so this harness catches
# that class of bug before the driver does.

def canon_spark_type(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("array"):
        return "array"
    if dt.startswith(("struct", "map")):
        return "nested"
    return {"bigint": "i64", "long": "i64", "int": "i32", "integer": "i32",
            "smallint": "i16", "tinyint": "i8", "double": "f64",
            "float": "f32", "string": "str", "varchar": "str",
            "boolean": "bool", "binary": "bytes", "date": "date",
            "timestamp": "ts", "timestamp_ntz": "ts"}.get(dt, dt)


def canon_duck_type(dt: str) -> str:
    dt = str(dt).upper()
    if dt.startswith("DECIMAL"):
        return "decimal"
    if dt.endswith("[]") or dt.startswith("LIST"):
        return "array"
    if dt.startswith(("STRUCT", "MAP")):
        return "nested"
    return {"BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16",
            "TINYINT": "i8", "HUGEINT": "i128", "UBIGINT": "u64",
            "UINTEGER": "u32", "DOUBLE": "f64", "FLOAT": "f32",
            "REAL": "f32", "VARCHAR": "str", "BOOLEAN": "bool",
            "BLOB": "bytes", "DATE": "date", "TIMESTAMP": "ts",
            "TIMESTAMP WITH TIME ZONE": "ts"}.get(dt, dt.lower())


def type_mismatches(spark_schema, ocols, otypes) -> list[str]:
    stypes = {f.name: canon_spark_type(f.dataType.simpleString())
              for f in spark_schema.fields}
    bad = []
    for c, t in zip(ocols, otypes):
        ot = canon_duck_type(t)
        st = stypes.get(c)
        if st is not None and st != ot:
            bad.append(f"{c}: spark={st} oracle={ot}")
    return bad


def frame_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    only = set(a.split("_")[0] for a in sys.argv[1:])
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name.split("_")[0] not in only:
            continue
        t0 = time.time()
        df = fn(spark, SF_DIR)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        spark_n, spark_h = frame_hash(cols, rows)
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows={spark_n:>7}  (rows-only, no oracle)  {dt:5.1f}s")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": spark_n,
                             "oracle_rows": None, "err": "no_oracle"}
            if spark_n == 0:
                failures.append((name, "zero rows (rows-only)"))
            continue
        rel = con.sql(oracles[name])
        ocols = rel.columns
        otypes = rel.types
        orows = rel.fetchall()
        oracle_n, oracle_h = frame_hash(ocols, orows)
        ok_cols = sorted(cols) == sorted(ocols)
        bad_types = type_mismatches(df.schema, ocols, otypes)
        ok = (ok_cols and spark_n == oracle_n and spark_h == oracle_h
              and not bad_types)
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} rows={spark_n:>7} oracle={oracle_n:>7} "
              f"hash={'=' if spark_h == oracle_h else '!'} "
              f"cols={'=' if ok_cols else '!'} "
              f"types={'=' if not bad_types else '!'} {status}  {dt:5.1f}s")
        results[name] = {"rows_match": spark_n == oracle_n,
                         "schema_match": ok_cols,
                         "hash_match": spark_h == oracle_h,
                         "types_match": not bad_types,
                         "spark_rows": spark_n, "oracle_rows": oracle_n,
                         "wall_sec": round(dt, 1), "err": None}
        if not ok:
            failures.append((name, f"spark=({spark_n},{spark_h}) "
                                   f"oracle=({oracle_n},{oracle_h}) "
                                   f"cols {cols} vs {ocols} "
                                   f"types {bad_types}"))
    spark.stop()
    out_json = os.environ.get("ORACLE_JSON_OUT")
    if out_json:
        import json
        with open(out_json, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "results": results}, fh, indent=2)
    if failures:
        print("\nFAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        return 1
    print("\nall checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
