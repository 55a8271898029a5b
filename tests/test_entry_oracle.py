"""Replicates the driver's correctness gate: every ``queries()``
entry vs its ``oracle_sql()`` DuckDB equivalent at sf0.01 —
row count, column names, and order-insensitive value equality.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_cell(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if v is None:
        return ("n",)
    if isinstance(v, int):
        return ("f", round(float(v), 9)) if abs(v) < 2**52 else ("i", v)
    try:  # Decimal from DuckDB round()
        from decimal import Decimal

        if isinstance(v, Decimal):
            return ("f", round(float(v), 9))
    except ImportError:
        pass
    return ("s", str(v))


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    data = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return names, data


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _entry_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ENTRY = _entry_module()
ORACLES = ENTRY.oracle_sql()
QUERIES = ENTRY.queries()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(ORACLES[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()

    sn, sd = _normalize(scols, srows)
    dn, dd = _normalize(dcols, drows)
    assert sn == dn, f"{name}: column mismatch {sn} vs {dn}"
    assert len(sd) == len(dd), f"{name}: rows {len(sd)} vs {len(dd)}"
    mism = [i for i, (a, b) in enumerate(zip(sd, dd)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} differing rows; first: "
        f"spark={sd[mism[0]]} oracle={dd[mism[0]]}"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0 and len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = ENTRY.entry(spark)
    assert df.count() >= 0
