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
        orows = rel.fetchall()
        oracle_n, oracle_h = frame_hash(ocols, orows)
        ok_cols = sorted(cols) == sorted(ocols)
        ok = ok_cols and spark_n == oracle_n and spark_h == oracle_h
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} rows={spark_n:>7} oracle={oracle_n:>7} "
              f"hash={'=' if spark_h == oracle_h else '!'} "
              f"cols={'=' if ok_cols else '!'} {status}  {dt:5.1f}s")
        results[name] = {"rows_match": spark_n == oracle_n,
                         "schema_match": ok_cols,
                         "hash_match": spark_h == oracle_h,
                         "spark_rows": spark_n, "oracle_rows": oracle_n,
                         "wall_sec": round(dt, 1), "err": None}
        if not ok:
            failures.append((name, f"spark=({spark_n},{spark_h}) "
                                   f"oracle=({oracle_n},{oracle_h}) "
                                   f"cols {cols} vs {ocols}"))
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
