"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle SQL on DuckDB at a given SF,
compare row count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes a driver-artifact-shaped file — one row
per query with rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err — so a FULL at-HEAD sweep can be committed alongside
the driver's (50-row-capped, rotating) CORRECTNESS sample.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime as dt
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return str(v)


def frame_hash(rows, colnames) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(lines), h


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from kgpipe.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"spark: {type(exc).__name__}: {exc}"}
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(s_rows),
                            "oracle_rows": None, "err": None,
                            "note": "rows-only (no oracle SQL)"}
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(s_rows),
                            "oracle_rows": None, "err": f"duckdb: {exc}"}
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        sn, sh = frame_hash(s_rows, s_cols)
        dn, dh = frame_hash(d_rows, d_cols)
        ok = (sorted(s_cols) == sorted(d_cols)) and sn == dn and sh == dh
        status = "OK   " if ok else "FAIL "
        if not ok:
            failures.append(name)
        report[name] = {"rows_match": sn == dn,
                        "schema_match": sorted(s_cols) == sorted(d_cols),
                        "hash_match": sh == dh,
                        "spark_rows": sn, "oracle_rows": dn, "err": None}
        print(f"{status} {name}: spark={sn} duck={dn} "
              f"cols={'=' if sorted(s_cols)==sorted(d_cols) else sorted(s_cols)+sorted(d_cols)} "
              f"hash={'=' if sh==dh else 'MISMATCH'} [{time.time()-t0:.1f}s]")
        if not ok and sn and dn and sorted(s_cols) == sorted(d_cols):
            s_set = set("|".join(norm_cell(r[i]) for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i])) for r in s_rows)
            d_set = set("|".join(norm_cell(r[i]) for i in sorted(range(len(d_cols)), key=lambda i: d_cols[i])) for r in d_rows)
            print("   spark-only:", sorted(s_set - d_set)[:3])
            print("   duck-only :", sorted(d_set - s_set)[:3])

    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=2, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
