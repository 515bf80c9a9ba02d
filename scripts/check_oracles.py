"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf dir, then compares row count, column names, and an
order-insensitive value hash. Usage::

    python scripts/check_oracles.py [--json out.json] [sf_dir] [query ...]

``--json`` additionally writes a driver-format artifact (one object per
query: rows/schema/hash match booleans, row counts, err) covering EVERY
query run — the full-surface record for queries outside the driver's
50-entry window.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as se
from poc_document_ocr_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # canonical float text: repr round-trips doubles exactly
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, len(rows)


def main() -> int:
    argv = sys.argv[1:]
    json_path = None
    if argv and argv[0] == "--json":
        json_path = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    # construction-literal oracles (compress_ratio) are built per-sf at
    # oracle_sql() call time; point them at the dir under test
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    only = set(argv[1:])
    spark = get_spark("check_oracles", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, os_ = se.queries(), se.oracle_sql()
    n_fail = 0
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        ent = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        record[name] = ent
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            ent["err"] = f"spark: {e}"
            n_fail += 1
            continue
        ent["spark_rows"] = len(rows)
        sql = os_.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle ({len(rows)} rows)")
            ent["err"] = "no oracle (rows-only check)"
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            ent["err"] = f"duckdb: {e}"
            n_fail += 1
            continue
        sh, sn = table_hash(cols, rows)
        oh, on = table_hash(ocols, orows)
        dt = time.monotonic() - t0
        ent["oracle_rows"] = on
        ent["rows_match"] = sn == on
        ent["schema_match"] = sorted(cols) == sorted(ocols)
        ent["hash_match"] = sh == oh and ent["rows_match"] and ent["schema_match"]
        if sorted(cols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(cols)} vs {sorted(ocols)}")
            n_fail += 1
        elif sn != on:
            print(f"FAIL {name}: rows {sn} vs {on}")
            n_fail += 1
        elif sh != oh:
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            _diff(cols, rows, ocols, orows)
            n_fail += 1
        else:
            print(f"OK   {name}: {sn} rows, {dt:.1f}s")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(record, f, indent=2)
        print("wrote", json_path)
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


def _diff(cols, rows, ocols, orows, limit=3):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
    a = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    b = sorted(tuple(canon(r[i]) for i in oorder) for r in orows)
    sa, sb = set(a), set(b)
    for x in list(sa - sb)[:limit]:
        print("  spark-only:", x)
    for x in list(sb - sa)[:limit]:
        print("  oracle-only:", x)


if __name__ == "__main__":
    raise SystemExit(main())
