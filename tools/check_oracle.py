"""Self-check harness mimicking the driver's DuckDB-oracle comparison.

Runs every ``__spark_entry__.queries()`` entry on Spark and, when an
``oracle_sql()`` entry exists, the same query on DuckDB over the same parquet
fixtures; compares row count, sorted column names, and an order-insensitive
value hash (values stringified, rows sorted).

Two deliberate strictness choices so that a local OK predicts the driver
(round-2 lesson — the old mirror certified two driver-red queries as OK):

* BOTH results are materialized through pandas (``.df()`` / ``toPandas()``),
  not ``fetchall()``/``collect()``: DuckDB's ``sum(BIGINT)`` returns HUGEINT
  which pandas renders as float64, so an oracle emitting a bare integer sum
  shows up here as ``"3510.0"`` vs Spark's ``"3510"`` — exactly the class of
  mismatch the driver's hash catches and ``fetchall()`` hides. Using pandas
  on the Spark side too mirrors the driver's tolerance: an int column with
  NULLs becomes float64 on both sides alike (r02 evidence: ``fact_union``
  passed the driver with exactly that shape while ``curation_pipeline``
  failed on a one-sided HUGEINT).
* Floats are normalized with ``repr`` (shortest round-trip, up to 17
  significant digits), not ``%.6g``, so last-ULP summation-order divergence
  between engines fails locally too.

Query-authoring rule this tool enforces by construction: never emit DECIMAL
columns (DuckDB ``.df()`` renders them float64 while Spark keeps Decimal —
guaranteed mismatch; cast to DOUBLE or quantized BIGINT on both sides).
DATE columns are fine: both engines materialize them as datetime64 through
pandas/Arrow.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]

Set ``CHECK_ORACLE_VANILLA=1`` to run on a BARE ``SparkSession.builder
.getOrCreate()`` instead of the repo's tuned session — the driver runs the
catalog on its own session (round 1 lost 9 rows to a session-build-time
conf), so a green vanilla sweep proves no query depends on
``session.get_spark``'s settings.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os
import sys
import time
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

REPO_ROOT = os.environ.get(
    "SPARK_GRAFT_REPO_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, REPO_ROOT)

from etl_data_transformer_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # repr: shortest string that round-trips the double — int-valued
        # floats stay visibly floats ("3510.0") and ULP diffs stay visible.
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return v.to_pydatetime().isoformat(sep=" ")
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def table_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    norm_rows = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(norm_rows).encode()).hexdigest()[:16]
    return len(rows), sorted_cols, h


def _norm_sorted_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for r in [row] for i in order) for row in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    import os

    if os.environ.get("CHECK_ORACLE_VANILLA"):
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
        print("# vanilla session (no repo confs)")
    else:
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
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        sn, sc, sh = table_fingerprint(scols, srows)
        if name not in oracles:
            print(f"OK?  {name}: rows-only (no oracle) rows={sn} cols={sc} [{spark_s:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
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
                srt = _norm_sorted_rows(scols, srows)
                ort = _norm_sorted_rows(ocols, orows)
                diffs = [(a, b) for a, b in zip(srt, ort) if a != b][:3]
                for a, b in diffs:
                    print(f"     spark: {a[:240]}\n     duck : {b[:240]}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
