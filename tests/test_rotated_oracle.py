"""Driver-strength oracle checks for catalog queries rotated OUT of the
50-slot driver contract (round-4 promotion swap — catalog/__init__.py
``ROTATED_QUERIES``).

Rotation must not weaken verification: every rotated query runs the SAME
compare the driver does (row count, sorted column names, order-insensitive
value hash vs DuckDB on the same parquet fixtures), via the
tools/check_oracle.py fingerprint helpers the round-3 float audit hardened.
"""

from __future__ import annotations

import importlib.util
import pathlib

import duckdb
import pytest

from etl_data_transformer_spark.catalog import ROTATED_ORACLES, ROTATED_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_spec = importlib.util.spec_from_file_location(
    "check_oracle", pathlib.Path(__file__).resolve().parent.parent / "tools" / "check_oracle.py"
)
_check_oracle = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check_oracle)
table_fingerprint = _check_oracle.table_fingerprint


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def test_every_rotated_query_has_an_oracle():
    assert set(ROTATED_ORACLES) == set(ROTATED_QUERIES)


@pytest.mark.parametrize("name", sorted(ROTATED_QUERIES))
def test_rotated_query_matches_oracle(spark, duck, name):
    spdf = ROTATED_QUERIES[name](spark, SF_DIR).toPandas()
    sn, sc, sh = table_fingerprint(
        list(spdf.columns), [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    )
    odf = duck.sql(ROTATED_ORACLES[name]).df()
    on, oc, oh = table_fingerprint(
        list(odf.columns), [tuple(r) for r in odf.itertuples(index=False, name=None)]
    )
    assert (sn, sc, sh) == (on, oc, oh), f"{name}: spark ({sn},{sc},{sh}) != duck ({on},{oc},{oh})"
