"""Local replica of the driver's correctness gate: run every queries() entry
on Spark at sf0.001 AND its oracle_sql() twin in DuckDB, compare row count,
column names, and order-insensitive values.

This is the test that de-risks CORRECTNESS_r{N}.json — if it is green here,
the driver's sf0.01 comparison should be green too.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:  # decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except ImportError:
        pass
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


QUERY_NAMES = sorted(entrymod.queries().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_vs_oracle(spark, name):
    """Mimic the driver's canonicalization path: BOTH sides go through pandas
    (Spark .toPandas(), DuckDB .df()), so dtype-representation bugs the driver
    would hit (e.g. DuckDB HUGEINT -> float64 vs Spark bigint -> int64, or
    unhashable array columns in sort_values) surface locally too."""
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    pdf_s = sdf.toPandas()

    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(pdf_s) >= 0  # rows-only check
        return
    con = _duck_con()
    cur = con.execute(oracle)
    pdf_d = cur.df()

    assert sorted(pdf_s.columns) == sorted(pdf_d.columns), (
        f"{name}: column mismatch {sorted(pdf_s.columns)} vs {sorted(pdf_d.columns)}"
    )
    assert len(pdf_s) == len(pdf_d), (
        f"{name}: row count {len(pdf_s)} vs oracle {len(pdf_d)}"
    )
    cols = sorted(pdf_s.columns)
    pdf_s = pdf_s[cols]
    pdf_d = pdf_d[cols]
    for c in cols:
        ks, kd = pdf_s[c].dtype.kind, pdf_d[c].dtype.kind
        # treat signed/unsigned int alike; everything else must match kind
        grp = lambda k: "i" if k in "iu" else k
        assert grp(ks) == grp(kd), (
            f"{name}: dtype kind mismatch on {c}: spark {pdf_s[c].dtype} "
            f"vs oracle {pdf_d[c].dtype} (driver canon would hash-mismatch)"
        )
    # driver-style sort_values: raises on unhashable (list/array) columns
    pdf_s.sort_values(by=cols, inplace=True, kind="mergesort")
    pdf_d.sort_values(by=cols, inplace=True, kind="mergesort")
    sc = _canon([tuple(r) for r in pdf_s.itertuples(index=False)], cols)
    dc = _canon([tuple(r) for r in pdf_d.itertuples(index=False)], cols)
    mism = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={sc[mism[0]]} oracle={dc[mism[0]]}"
    )
