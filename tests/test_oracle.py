"""Oracle parity for every registered query at sf0.001 — the local
mirror of the driver's sf0.01 gate (SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import _canon_rows

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_callable():
    assert QUERIES, "registry is empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    scols, srows = _canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no oracle)")
    res = duck.execute(ORACLES[name])
    dcols, drows = _canon_rows([d[0] for d in res.description], res.fetchall())
    assert scols == dcols, f"column mismatch: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert srows == drows
