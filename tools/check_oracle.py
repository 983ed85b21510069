"""Self-check harness mimicking the driver's DuckDB-oracle comparison.

Runs every ``__spark_entry__.queries()`` entry on Spark and, when an
``oracle_sql()`` entry exists, the same query on DuckDB over the same parquet
fixtures; compares row count, sorted column names, and an order-insensitive
value hash (values stringified with float rounding, rows sorted).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from etl_data_transformer_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, Decimal):
        return f"{float(v):.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def table_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    norm_rows = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(norm_rows).encode()).hexdigest()[:16]
    return len(rows), sorted_cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        sn, sc, sh = table_fingerprint(scols, [tuple(r) for r in srows])
        if name not in oracles:
            print(f"OK?  {name}: rows-only (no oracle) rows={sn} cols={sc} [{spark_s:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        on, oc, oh = table_fingerprint(ocols, orows)
        status = "OK  " if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        print(f"{status} {name}: spark rows={sn} hash={sh} | duck rows={on} hash={oh} [{spark_s:.1f}s]")
        if status == "FAIL":
            failures.append(name)
            if sc != oc:
                print(f"     cols spark={sc}\n     cols duck ={oc}")
            if sn == on and sc == oc:
                srt = sorted(
                    "|".join(_norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in [tuple(r) for r in srows]
                )
                ort = sorted(
                    "|".join(_norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                )
                diffs = [(a, b) for a, b in zip(srt, ort) if a != b][:3]
                for a, b in diffs:
                    print(f"     spark: {a[:200]}\n     duck : {b[:200]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
