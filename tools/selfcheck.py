"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet fixtures, then compares row count,
column names, and order-insensitive canonicalized values. Use while
iterating so driver-side CORRECTNESS_r{N}.json holds no surprises.

Usage:  python tools/selfcheck.py [sf_dir] [query ...]
        (default sf_dir: /root/testdata/sf0.01; default: all queries)

``--sample N --seed R`` (VERDICT r9 task 7): check a seeded random
N-query sample instead of the full surface — the rotating audit the
close cycle runs at sf0.1, covering the driver gate's blind spot (its
CORRECTNESS sample has been the same 50 relational names since round
1, so nothing added after round 5 is ever driver-verified). The seed
goes into the JSON artifact so the judge can re-draw the exact
sample; rotate the seed per round (the close convention: seed =
round number) and the expectation is full-surface coverage every
ceil(|surface|/N) rounds.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from meepo_spark.catalog import TABLES
from meepo_spark.session import get_spark


def _canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries already round; 9dp absorbs representation noise
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon = sorted("\x01".join(_canon_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, canon


def check(
    sf_dir: str,
    names: list[str] | None = None,
    json_path: str | None = None,
    sample: int | None = None,
    seed: int | None = None,
) -> int:
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or sorted(qs)
    if sample is not None:
        import random

        rng = random.Random(seed)
        names = sorted(rng.sample(sorted(names), min(sample, len(names))))
        print(f"sample: {len(names)} queries, seed={seed}")
    failed: list[str] = []
    report: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "values_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "secs": None,
            "err": None,
        }
        report[name] = rec
        try:
            sdf = qs[name](None if False else spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            rec["err"] = "spark raised"
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            # ran fine, just ungradeable: None (not False) so a JSON
            # consumer filtering on match==False doesn't misread a
            # rows-only query as a failure (code-review r7 #5)
            rec["rows_match"] = rec["schema_match"] = rec["values_match"] = None
            rec["status"] = "rows-only"
            rec["secs"] = round(time.time() - t0, 2)
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            rec["err"] = "duckdb raised"
            failed.append(name)
            continue
        sc, sr = _canon_rows(scols, srows)
        dc, dr = _canon_rows(dcols, drows)
        rec["schema_match"] = sc == dc
        rec["rows_match"] = len(sr) == len(dr)
        rec["secs"] = round(time.time() - t0, 2)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duckdb={dc}")
            failed.append(name)
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duckdb={len(dr)}")
            failed.append(name)
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            failed.append(name)
        else:
            rec["values_match"] = True
            print(f"PASS {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")
    print(
        f"\n{len(names)-len(failed)}/{len(names)} passed"
        + (f"; FAILED: {', '.join(failed)}" if failed else "")
    )
    if json_path:
        # VERDICT r6 #6: serialize the FULL replica-gate result in the
        # CORRECTNESS_r*.json shape (plus timing), so the driver's
        # 50-query sample's blind spot is auditable by diff instead of
        # re-execution.
        payload = {
            "sf_dir": sf_dir,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "n_queries": len(names),
            "n_failed": len(failed),
            "failed": failed,
            "queries": report,
        }
        if sample is not None:
            payload["sample"] = {"n": len(names), "seed": seed}
        with open(json_path, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
        print(f"wrote {json_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    args = sys.argv[1:]

    def _opt(flag: str):
        if flag not in args:
            return None
        i = args.index(flag)
        if i + 1 >= len(args):
            print(
                "usage: selfcheck.py [sf_dir] [names...] [--json PATH] "
                "[--sample N --seed R]"
            )
            sys.exit(2)
        v = args[i + 1]
        del args[i : i + 2]
        return v

    json_path = _opt("--json")
    sample = _opt("--sample")
    seed = _opt("--seed")
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    rest = args[1:] if args and os.path.isdir(args[0]) else args
    sys.exit(
        check(
            sf,
            rest or None,
            json_path=json_path,
            sample=int(sample) if sample is not None else None,
            seed=int(seed) if seed is not None else None,
        )
    )
