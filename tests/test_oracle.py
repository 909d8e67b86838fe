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


@pytest.fixture(scope="module")
def parity_results(spark, duck, sf_dir):
    """Collect every query's canonicalized Spark rows ONCE, overlapping
    independent queries through a small thread pool (guide §2.6) —
    sequentially, the 370-query parity sweep dominated the suite's
    wall time (optimization r11). Queries that write real store/sink
    artifacts under shared per-sf temp roots (the a-family event
    stores, the s-family sinks) run sequentially afterwards so no two
    concurrent invocations touch one store. Each entry is
    (cols, rows) or the raised exception; the parametrized test below
    keeps per-query reporting."""
    from concurrent.futures import ThreadPoolExecutor

    out: dict[str, object] = {}

    def run(name: str):
        try:
            sdf = QUERIES[name](spark, sf_dir)
            out[name] = _canon_rows(
                sdf.columns, [tuple(r) for r in sdf.collect()]
            )
        except Exception as exc:  # surfaced by the per-query test
            out[name] = exc

    parallel = [n for n in sorted(QUERIES) if not n.startswith(("a", "s"))]
    serial = [n for n in sorted(QUERIES) if n.startswith(("a", "s"))]
    with ThreadPoolExecutor(max_workers=10) as pool:
        list(pool.map(run, parallel))
    for name in serial:
        run(name)
    return out


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(parity_results, duck, name):
    got = parity_results[name]
    if isinstance(got, Exception):
        raise got
    scols, srows = got
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no oracle)")
    res = duck.execute(ORACLES[name])
    dcols, drows = _canon_rows([d[0] for d in res.description], res.fetchall())
    assert scols == dcols, f"column mismatch: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert srows == drows
