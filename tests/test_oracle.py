"""Oracle parity harness as a test: every queries() entry must match
its oracle_sql() twin on sf0.001 (row count + columns + sorted values).
This is a local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL
from tools.check_parity import normalize

QUERY_NAMES = sorted(entrymod.queries())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_SMALL)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    oracles = entrymod.oracle_sql()
    if name not in oracles:
        pytest.skip("rows-only query (no SQL oracle)")
    res = duck.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"column mismatch for {name}"
    assert len(srows) == len(orows), f"row count mismatch for {name}"
    assert normalize(srows, scols) == normalize(orows, ocols), f"value mismatch for {name}"


def test_normalize_canonicalizes_decimal_rendering():
    """r5 verdict #3: the driver hashes stringified raw values, so an
    engine that renders a DECIMAL as '9561.950' must hash equal to one
    that renders '9561.95' — normalize must strip trailing zeros (and
    fold -0) BEFORE stringification, or a pure scale difference ships
    as a locally-invisible hash mismatch."""
    import decimal

    D = decimal.Decimal
    a = normalize([(D("9561.950"),)], ["v"])
    b = normalize([(D("9561.95"),)], ["v"])
    assert a == b
    # integral values must not regress into scientific notation
    assert normalize([(D("100.00"),)], ["v"]) == normalize([(D("100"),)], ["v"])
    assert normalize([(D("100"),)], ["v"])[0][0] == "100"
    # negative zero folds to zero at any scale
    assert normalize([(D("-0.00"),)], ["v"]) == normalize([(D("0"),)], ["v"])
    # and distinct values stay distinct
    assert normalize([(D("1.10"),)], ["v"]) != normalize([(D("1.2"),)], ["v"])
