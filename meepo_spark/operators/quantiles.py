"""Exact interpolated quantiles WITHOUT the percentile value-map merge
(VERDICT r9 #1 — the generalization of dq10's rework, upgraded to the
two-phase bucket-refinement shape).

Why `F.percentile` is banned from the hot path: its partial state is a
per-task value→count map, and every task's map is merged on ONE final
reducer. For a near-unique measure (price cents at fact scale) that
merge is a domain-sized single-task hash build — the repo's own dq10
analysis measured it as the whole query's cost AND variance at sf0.1,
and at 100 TB it is an OOM, not a plan.

Both operators here compute quantile_cont with TWO fact passes and NO
shuffle wider than the bucket grid — the classic distributed
exact-quantile (bucket refinement), on a STATIC-width grid so no
range pre-pass is needed (the g11/v24 fixed-band discipline):

1. **coarse census** — per-(key, ⌊v/width⌋) counts: one map-side-
   combined aggregate, bounded at keys × (domain/width) rows and
   pulled over Arrow. Bounded driver state, NOT fact rows (the
   k-means-centroid / BPE-merge-table precedent): the aggregate runs
   fully parallel with map-side combine; only the SF-independent
   census summary reaches the driver.
2. **locate (driver)** — per group, the bucket CDF is an exact
   integer prefix sum over the sorted census; quantile_cont needs the
   order statistics at ranks ⌊(n−1)q⌋ and ⌈(n−1)q⌉, and each rank
   names exactly ONE straddling bucket. The ≤ 2·|qs| hot buckets per
   group go back to the executors as a broadcast LOCAL relation — no
   extra jobs, unlike the r10-draft's three census-derived broadcast
   joins which made the call a ~12-job DAG of scheduling latency.
3. **refine** — re-scan filtered to the straddling buckets only
   (broadcast semi-shape join against the local hot-bucket relation),
   aggregate per distinct value there (≤ width values per hot
   bucket); the surviving group-grain counts come back over Arrow,
   and the exact global ranks (bucket CDF offset + within-bucket
   prefix) and the interpolation
   x(⌊pos⌋) + frac·(x(⌈pos⌉) − x(⌊pos⌋)) are integer-exact driver
   arithmetic. Keeping this tail in Spark is correct but slower:
   every AQE query stage is a scheduled job, and the ~7-job tail
   (bounded window + totals join + final agg) costs more wall than
   the census at any SF while touching only width-bounded data.

`exact_median_mad` goes one step further for the MAD shape
(median of |x − median|): a naive composition needs FOUR rounds
(census + refine, twice). But the deviation pass's rank-crossing
region is computable from the FIRST census alone — after the census
the median is known to within one bucket, so interval arithmetic over
the bucket grid bounds which c-buckets can contain the deviation
order statistics — and the median refine and the deviation refine
collapse into ONE combined fetch: exactly TWO distributed rounds for
median AND MAD. See the function docstring for the band math and the
correctness net.

Exactness: every rank is exact integer arithmetic; interpolation over
INTEGER (or exactly-representable) values at fixed fractions is
IEEE-exact in the same association order, so results bit-match
DuckDB's `quantile_cont` after the consumer's rounding — the dq10
contract, property-tested against `F.percentile` on random multisets
in tests/test_properties.py.

Width contract: ``bucket_width`` bounds BOTH frames — the collected
census at keys × domain/width rows (keep it ≲ 10⁵; for bounded-domain
measures like TPC-H price cents this is SF-INDEPENDENT) and the
refine set at ``width`` distinct values per hot bucket. For integer
cents at fact scale, 1024 gives a ~10⁴-row census and ≤1024-value
refine sets. A degenerate choice degrades capacity, never
correctness.

NULL semantics match `F.percentile`: null measures are skipped; a
group whose measures are ALL null yields no output row (consumers
that need the group present pivot with max-when, which reads the
absence as NULL — v4's discounted lane).
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _py(v):
    """numpy scalar -> python scalar (createDataFrame-safe)."""
    return v.item() if hasattr(v, "item") else v


def _prep(df, keys, col, weight, bucket_width):
    """Shared pass-1 plumbing: null-filtered (keys, __v, __w) frame,
    the bucket-id expression, and the census pulled as pandas."""
    c = F.col(col) if isinstance(col, str) else col
    if weight is None:
        w = F.lit(1).cast("long")
    else:
        w = (F.col(weight) if isinstance(weight, str) else weight).cast("long")
    base = df.select(*keys, c.alias("__v"), w.alias("__w")).filter(
        F.col("__v").isNotNull()
    )
    pid = F.floor(F.col("__v") / F.lit(float(bucket_width)))
    census = (
        base.groupBy(*keys, pid.alias("__b"))
        .agg(F.sum("__w").alias("__bc"))
        .toPandas()
    )
    return base, pid, census


def _groups(pdf, keys):
    """Iterate (key-tuple, sub-frame) over a pandas frame, tolerating
    empty key lists and null key values."""
    if not len(pdf):
        return
    pdf = pdf.sort_values([*keys, "__b"] if keys else ["__b"])
    grouped = pdf.groupby(keys, dropna=False, sort=False) if keys else [((), pdf)]
    for g, sub in grouped:
        if keys and not isinstance(g, tuple):
            g = (g,)
        yield tuple(_py(x) for x in g), sub


def _fetch_values(base, pid, keys, key_fields, bucket_rows):
    """Pass 2: per-value weighted counts inside the named buckets only
    (broadcast semi-shape join against a LOCAL relation), as pandas
    sorted by (keys, __b, __v)."""
    spark = base.sparkSession
    hot = spark.createDataFrame(
        bucket_rows,
        T.StructType(key_fields + [T.StructField("__b", T.LongType())]),
    )
    ph2 = (
        base.withColumn("__b", pid)
        .join(F.broadcast(hot), [*keys, "__b"])  # bcast: fixed (O(|qs|) hot buckets/group, a LOCAL relation)
        .groupBy(*keys, "__b", "__v")
        .agg(F.sum("__w").alias("__c"))
        .toPandas()
    )
    if len(ph2):
        ph2 = ph2.sort_values([*keys, "__b", "__v"] if keys else ["__b", "__v"])
    return ph2


def _interp_at(pos: float, xs: np.ndarray, lo_r: np.ndarray, hi_r: np.ndarray):
    """quantile_cont at fractional rank ``pos`` given value rows with
    global rank intervals [lo_r, hi_r) — bit-matching F.percentile:
    linear interpolation between the straddling order statistics."""

    def x_at(k: int) -> float:
        i = int(np.searchsorted(lo_r, k, side="right")) - 1
        assert 0 <= i and k < hi_r[i], (k, len(xs))
        return float(xs[i])

    lo, hi = math.floor(pos), math.ceil(pos)
    frac = pos - lo
    xlo = x_at(lo)
    return xlo + frac * (x_at(hi) - xlo)


def exact_quantiles_cdf(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    qs: Mapping[str, float],
    bucket_width: float = 1024.0,
    weight: str | Column | None = None,
    extrema: bool = False,
) -> DataFrame:
    """Exact per-group quantile_cont over ``col`` (integer-valued or
    exactly-representable doubles), NULLs skipped (`F.percentile`
    semantics). Returns one row per key group: ``keys…, n`` (BIGINT
    non-null count) and one DOUBLE column per ``qs`` entry
    ``{out_name: fraction}``.

    ``weight`` (optional, INTEGER repeat counts) treats each input
    row as `weight` occurrences of its value — pass a value-grain
    histogram (`groupBy(value).count()`) instead of fact rows when a
    query needs SEVERAL quantile passes over the same measure. Ranks
    stay exact integers; results are identical to the unweighted call
    on the expanded multiset (property-tested).

    ``extrema`` (optimization r11) additionally returns the exact
    per-group ``lo``/``hi`` (DOUBLE — min/max of the measure): the
    lowest and highest census buckets join the hot set, so a consumer
    needing count+min+max+quantiles (e9/e16's report row) gets them
    from the SAME census+refine passes instead of one more aggregate
    job over the input.

    Both passes (census + refine) run EAGERLY at call time; the
    returned DataFrame is a group-grain LOCAL relation. See the
    module docstring for the plan shape and the width contract."""
    keys = list(keys)
    spark = df.sparkSession
    base, pid, census = _prep(df, keys, col, weight, bucket_width)
    key_fields = [base.schema[k] for k in keys]

    # locate: the <= 2|qs| straddling buckets per group, exact
    # integer ranks throughout
    hot_rows: list[tuple] = []
    n_map: dict[tuple, int] = {}
    cbmap: dict[tuple, int] = {}  # (keys…, b) -> bucket CDF offset
    for g, sub in _groups(census, keys):
        bc = sub["__bc"].to_numpy()
        bs = sub["__b"].to_numpy()
        cb = np.concatenate(([0], np.cumsum(bc)[:-1]))
        n = int(bc.sum())
        need = sorted(
            {
                int(r)
                for q in qs.values()
                for r in (
                    math.floor((n - 1) * float(q)),
                    math.ceil((n - 1) * float(q)),
                )
            }
        )
        # rank r lives in the rightmost bucket whose CDF offset <= r
        idx = np.searchsorted(cb, need, side="right") - 1
        want = set(idx.tolist())
        if extrema:
            want.update((0, len(bs) - 1))  # exact min/max buckets
        for i in sorted(want):
            hot_rows.append((*g, int(bs[i])))
            cbmap[(*g, int(bs[i]))] = int(cb[i])
        n_map[g] = n

    ph2 = _fetch_values(base, pid, keys, key_fields, hot_rows)

    out_schema = T.StructType(
        key_fields
        + [T.StructField("n", T.LongType())]
        + [T.StructField(name, T.DoubleType()) for name in qs]
        + (
            [T.StructField("lo", T.DoubleType()), T.StructField("hi", T.DoubleType())]
            if extrema
            else []
        )
    )
    out_rows: list[tuple] = []
    for g, sub in _groups(ph2, keys):
        n = n_map[g]
        # global rank interval per surviving value: the bucket's CDF
        # offset + the within-bucket running count
        lo_r: list[int] = []
        hi_r: list[int] = []
        xs: list[float] = []
        cur_b, cum = None, 0
        for b, v, cnt in zip(
            sub["__b"].to_numpy(), sub["__v"].to_numpy(), sub["__c"].to_numpy()
        ):
            if b != cur_b:
                cur_b, cum = b, cbmap[(*g, int(b))]
            lo_r.append(cum)
            cum += int(cnt)
            hi_r.append(cum)
            xs.append(float(v))
        lo_a, hi_a, xs_a = np.asarray(lo_r), np.asarray(hi_r), np.asarray(xs)
        vals = [
            _interp_at((n - 1) * float(q), xs_a, lo_a, hi_a) for q in qs.values()
        ]
        if extrema:
            # the fetched set provably contains the group's lowest and
            # highest buckets; ph2 is sorted by (__b, __v) within g
            vals += [float(xs_a[0]), float(xs_a[-1])]
        out_rows.append((*g, n, *vals))

    return spark.createDataFrame(out_rows, out_schema)


def exact_quantiles_cdf_multi(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    measures: Mapping[str, Column],
    qs: Mapping[str, float],
    bucket_width: float = 1024.0,
) -> DataFrame:
    """`exact_quantiles_cdf` for SEVERAL measures over the same value
    column in ONE census pass + ONE refine pass: ``measures`` maps a
    measure name to an integer WEIGHT expression (1/0 for "row belongs
    to this measure's multiset"), and the output carries one row per
    (keys…, m) with the same ``n`` + quantile columns as the single
    call. Value rows whose weight is 0 for a measure are skipped for
    that measure exactly like NULLs in the single call.

    Why (optimization r11): v4's (all, discounted) pair ran through a
    stack() melt — an Expand DOUBLING every fact row through both the
    census and refine aggregates. Two weight columns make both passes
    single-width; results are identical to per-measure single calls
    (property-tested)."""
    keys = list(keys)
    spark = df.sparkSession
    c = F.col(col) if isinstance(col, str) else col
    mnames = list(measures)
    base = df.select(
        *keys,
        c.alias("__v"),
        *[w.cast("long").alias(f"__w_{m}") for m, w in measures.items()],
    ).filter(F.col("__v").isNotNull())
    pid = F.floor(F.col("__v") / F.lit(float(bucket_width)))
    census = (
        base.groupBy(*keys, pid.alias("__b"))
        .agg(*[F.sum(f"__w_{m}").alias(f"__bc_{m}") for m in mnames])
        .toPandas()
    )
    key_fields = [base.schema[k] for k in keys]

    hot: dict[tuple, set] = {}  # key-group -> needed buckets (union over m)
    meta: dict[tuple, dict] = {}  # (g, m) -> {n, cb_of}
    for g, sub in _groups(census, keys):
        bs = sub["__b"].to_numpy()
        want: set[int] = set()
        for m in mnames:
            bc = sub[f"__bc_{m}"].to_numpy()
            cb = np.concatenate(([0], np.cumsum(bc)[:-1]))
            n = int(bc.sum())
            if n == 0:
                continue  # measure empty in this group: no output row
            need = sorted(
                {
                    int(r)
                    for q in qs.values()
                    for r in (
                        math.floor((n - 1) * float(q)),
                        math.ceil((n - 1) * float(q)),
                    )
                }
            )
            idx = np.searchsorted(cb, need, side="right") - 1
            want.update(int(bs[i]) for i in set(idx.tolist()))
            meta[(g, m)] = {
                "n": n,
                "cb_of": {int(b): int(o) for b, o in zip(bs, cb)},
            }
        if want:
            hot[g] = want
    fetch_rows = [(*g, b) for g, bs_ in hot.items() for b in sorted(bs_)]

    spark_hot = spark.createDataFrame(
        fetch_rows,
        T.StructType(key_fields + [T.StructField("__b", T.LongType())]),
    )
    ph2 = (
        base.withColumn("__b", pid)
        .join(F.broadcast(spark_hot), [*keys, "__b"])  # bcast: fixed (O(|qs|·|measures|) hot buckets/group)
        .groupBy(*keys, "__b", "__v")
        .agg(*[F.sum(f"__w_{m}").alias(f"__c_{m}") for m in mnames])
        .toPandas()
    )
    if len(ph2):
        ph2 = ph2.sort_values([*keys, "__b", "__v"] if keys else ["__b", "__v"])

    out_schema = T.StructType(
        key_fields
        + [T.StructField("m", T.StringType()), T.StructField("n", T.LongType())]
        + [T.StructField(name, T.DoubleType()) for name in qs]
    )
    out_rows: list[tuple] = []
    for g, sub in _groups(ph2, keys):
        for m in mnames:
            if (g, m) not in meta:
                continue
            mt = meta[(g, m)]
            n, cb_of = mt["n"], mt["cb_of"]
            lo_r: list[int] = []
            hi_r: list[int] = []
            xs: list[float] = []
            cur_b, cum = None, 0
            for b, v, cnt in zip(
                sub["__b"].to_numpy(),
                sub["__v"].to_numpy(),
                sub[f"__c_{m}"].to_numpy(),
            ):
                if b != cur_b:
                    cur_b, cum = b, cb_of[int(b)]
                if int(cnt) == 0:
                    continue  # value absent from this measure's multiset
                lo_r.append(cum)
                cum += int(cnt)
                hi_r.append(cum)
                xs.append(float(v))
            lo_a, hi_a, xs_a = np.asarray(lo_r), np.asarray(hi_r), np.asarray(xs)
            vals = [
                _interp_at((n - 1) * float(q), xs_a, lo_a, hi_a)
                for q in qs.values()
            ]
            out_rows.append((*g, m, n, *vals))
    return spark.createDataFrame(out_rows, out_schema)


def exact_quantiles_disc(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    qs: Mapping[str, float],
    bucket_width: float = 1024.0,
    weight: str | Column | None = None,
    extrema: bool = False,
) -> DataFrame:
    """Exact per-group DISCRETE quantiles (percentile_disc /
    quantile_disc lower-bound convention: the smallest value whose
    cumulative distribution reaches q) over ``col``, same two-pass
    census+refine shape and width contract as `exact_quantiles_cdf`.

    Rank rule: percentile_disc picks the order statistic at 0-based
    rank ⌈q·n⌉ − 1, with q·n evaluated as a DOUBLE product exactly as
    the Spark/DuckDB aggregates do (so e.g. 0.9·10 → 9.0000000000000
    02 rounds UP to the 10th value on every engine) — property-tested
    against Spark's `percentile_disc` on random multisets in
    tests/test_properties.py. No interpolation: each output is an
    exact input value, returned as DOUBLE (exact for integer measures
    below 2^53; cast at the consumer).

    Why it exists (optimization r11, VERDICT r10 #3): percentile_disc
    carries the same per-task value→count map merged on one reducer
    per group as `F.percentile` — a user-grain domain (e16's
    microsecond delays) makes that map unbounded at 100 TB."""
    keys = list(keys)
    spark = df.sparkSession
    base, pid, census = _prep(df, keys, col, weight, bucket_width)
    key_fields = [base.schema[k] for k in keys]

    def _ranks(n: int) -> dict[str, int]:
        # 0-based rank of each q's order statistic; q*n as a double
        # product, matching the aggregate's arithmetic
        return {
            name: min(max(math.ceil(float(q) * n) - 1, 0), n - 1)
            for name, q in qs.items()
        }

    hot_rows: list[tuple] = []
    n_map: dict[tuple, int] = {}
    cbmap: dict[tuple, int] = {}
    for g, sub in _groups(census, keys):
        bc = sub["__bc"].to_numpy()
        bs = sub["__b"].to_numpy()
        cb = np.concatenate(([0], np.cumsum(bc)[:-1]))
        n = int(bc.sum())
        need = sorted(set(_ranks(n).values()))
        idx = np.searchsorted(cb, need, side="right") - 1
        want = set(idx.tolist())
        if extrema:
            want.update((0, len(bs) - 1))  # exact min/max buckets
        for i in sorted(want):
            hot_rows.append((*g, int(bs[i])))
            cbmap[(*g, int(bs[i]))] = int(cb[i])
        n_map[g] = n

    ph2 = _fetch_values(base, pid, keys, key_fields, hot_rows)

    out_schema = T.StructType(
        key_fields
        + [T.StructField("n", T.LongType())]
        + [T.StructField(name, T.DoubleType()) for name in qs]
        + (
            [T.StructField("lo", T.DoubleType()), T.StructField("hi", T.DoubleType())]
            if extrema
            else []
        )
    )
    out_rows: list[tuple] = []
    for g, sub in _groups(ph2, keys):
        n = n_map[g]
        lo_r: list[int] = []
        hi_r: list[int] = []
        xs: list[float] = []
        cur_b, cum = None, 0
        for b, v, cnt in zip(
            sub["__b"].to_numpy(), sub["__v"].to_numpy(), sub["__c"].to_numpy()
        ):
            if b != cur_b:
                cur_b, cum = b, cbmap[(*g, int(b))]
            lo_r.append(cum)
            cum += int(cnt)
            hi_r.append(cum)
            xs.append(float(v))
        lo_a, hi_a, xs_a = np.asarray(lo_r), np.asarray(hi_r), np.asarray(xs)
        rk = _ranks(n)
        vals = [
            _interp_at(float(rk[name]), xs_a, lo_a, hi_a) for name in qs
        ]
        if extrema:
            vals += [float(xs_a[0]), float(xs_a[-1])]
        out_rows.append((*g, n, *vals))

    return spark.createDataFrame(out_rows, out_schema)


def exact_median_mad(
    df: DataFrame,
    keys: Sequence[str],
    col: str | Column,
    bucket_width: float = 1024.0,
    weight: str | Column | None = None,
) -> DataFrame:
    """Exact per-group median AND median-absolute-deviation
    (quantile_cont semantics for both: MAD = median of |x − median|,
    each median interpolated) over an INTEGER-valued ``col``, in
    exactly TWO distributed rounds. Returns ``keys…, n, m, mad``.

    A naive composition is four rounds: census+refine for the median,
    then census+refine over |x − m|. The census already pins the
    median to ONE bucket, so before any refine we know
    m ∈ [m_lo, m_hi] (that bucket's value extent) — and interval
    arithmetic over the SAME census bounds the deviation count
    #{x : |x−m| ≤ t} for every threshold t:

    * a bucket [lo, hi] surely lies inside the window for every
      feasible m once t ≥ max(m_hi − lo, hi − m_lo)   (t_full_max),
    * it surely lies outside while t < max(lo − m_hi, m_lo − hi)
      (t_out_min).

    Scanning the sorted grid of these thresholds gives certain lower/
    upper deviation-CDF envelopes; the deviation ranks ⌊(n−1)/2⌋ and
    ⌈(n−1)/2⌉ cross between the last grid t whose UPPER envelope is
    still short (t_a) and the first grid t whose LOWER envelope
    already covers (t_b). Every bucket that can be PARTIAL somewhere
    in [t_a, t_b] — t_out_min ≤ t_b and t_full_max ≥ t_a — joins the
    median's hot buckets in ONE combined per-value fetch; the source
    value of each deviation order statistic provably sits in such a
    bucket (at any t below the statistic its bucket is not yet fully
    inside for the true m, so t_full_max > t_a; and it overlaps by
    t_b, so t_out_min ≤ t_b).

    After the fetch, m is exact, and the deviation CDF is exact
    driver arithmetic: fetched buckets contribute at value grain
    (#{fetched v : |v−m| ≤ t}), every other bucket wholesale via its
    exact t_full(i) = max(m − lo, hi − m) threshold (prefix sums over
    the sorted thresholds). A final safety net re-fetches any bucket
    the exact m proves partial at the answer thresholds — unreachable
    if the band math is right (property-tested), but it turns a
    reasoning gap into a third round instead of a wrong answer.

    Scale shape: identical to `exact_quantiles_cdf` — one map-side-
    combined census (keys × domain/width rows) + one refine fetch
    (O(width · candidates) values per group), nothing else touches
    the fact."""
    keys = list(keys)
    spark = df.sparkSession
    wdt = float(bucket_width)
    base, pid, census = _prep(df, keys, col, weight, bucket_width)
    key_fields = [base.schema[k] for k in keys]

    fetch_rows: list[tuple] = []
    meta: dict[tuple, dict] = {}
    for g, sub in _groups(census, keys):
        bc = sub["__bc"].to_numpy().astype(np.int64)
        bs = sub["__b"].to_numpy().astype(np.int64)
        cb = np.concatenate(([0], np.cumsum(bc)[:-1]))
        n = int(bc.sum())
        r0, r1 = (n - 1) // 2, n // 2  # floor/ceil median ranks
        # median hot buckets (exact ranks, no uncertainty)
        med_idx = sorted(
            set((np.searchsorted(cb, [r0, r1], side="right") - 1).tolist())
        )
        # integer-value extents per bucket, and the feasible median
        # interval from its straddling bucket(s)
        lo_v = bs * int(wdt) if wdt.is_integer() else np.floor(bs * wdt)
        hi_v = (bs + 1) * int(wdt) - 1 if wdt.is_integer() else np.ceil((bs + 1) * wdt) - 1
        m_lo = float(lo_v[med_idx[0]])
        m_hi = float(hi_v[med_idx[-1]])
        # certain envelopes of the deviation CDF over the threshold grid
        t_full_max = np.maximum(m_hi - lo_v, hi_v - m_lo)
        t_full_max = np.maximum(t_full_max, 0.0)
        t_out_min = np.maximum(np.maximum(lo_v - m_hi, m_lo - hi_v), 0.0)
        grid = np.unique(np.concatenate((t_full_max, t_out_min)))

        def _env(ts: np.ndarray) -> np.ndarray:
            # cnt(t) = sum of bc over thresholds <= t, for every grid
            # point — prefix sums over the sorted thresholds, O(B log B)
            # (the loop form is O(grid x B): ~1e8 ops at a 10k-bucket
            # census, real driver seconds)
            order = np.argsort(ts, kind="stable")
            cum = np.concatenate(([0], np.cumsum(bc[order])))
            return cum[np.searchsorted(ts[order], grid, side="right")]

        cntL = _env(t_full_max)
        cntU = _env(t_out_min)
        # band: deviation ranks cross strictly above t_a, by t_b
        below = np.nonzero(cntU < r0 + 1)[0]
        t_a = float(grid[below[-1]]) if len(below) else -1.0
        covered = np.nonzero(cntL >= r1 + 1)[0]
        t_b = float(grid[covered[0]]) if len(covered) else float(grid[-1])
        cand = set(np.nonzero((t_out_min <= t_b) & (t_full_max >= t_a))[0].tolist())
        cand.update(med_idx)
        for i in sorted(cand):
            fetch_rows.append((*g, int(bs[i])))
        meta[g] = {
            "n": n,
            "bs": bs,
            "bc": bc,
            "cb": cb,
            "lo_v": lo_v,
            "hi_v": hi_v,
            "cand": {int(bs[i]) for i in cand},
        }

    fetched = _fetch_values(base, pid, keys, key_fields, fetch_rows)

    def solve(g: tuple, sub) -> tuple | None:
        mt = meta[g]
        n, bs, bc, cb = mt["n"], mt["bs"], mt["bc"], mt["cb"]
        vs = sub["__v"].to_numpy().astype(np.float64)
        vb = sub["__b"].to_numpy().astype(np.int64)
        vc = sub["__c"].to_numpy().astype(np.int64)
        # exact median from the fetched median-bucket values
        lo_r: list[int] = []
        hi_r: list[int] = []
        cur_b, cum = None, 0
        cb_of = {int(b): int(c) for b, c in zip(bs, cb)}
        for b, cnt in zip(vb, vc):
            if b != cur_b:
                cur_b, cum = b, cb_of[int(b)]
            lo_r.append(cum)
            cum += int(cnt)
            hi_r.append(cum)
        lo_a, hi_a = np.asarray(lo_r), np.asarray(hi_r)
        m = _interp_at((n - 1) * 0.5, vs, lo_a, hi_a)

        # exact deviation CDF: fetched buckets at value grain, the
        # rest wholesale at their exact full-inclusion threshold
        in_cand = np.isin(bs, np.fromiter(mt["cand"], dtype=np.int64, count=len(mt["cand"])))
        t_full = np.maximum(np.maximum(m - mt["lo_v"], mt["hi_v"] - m), 0.0)
        rest_t = t_full[~in_cand]
        rest_c = bc[~in_cand]
        order = np.argsort(rest_t, kind="stable")
        rest_t, rest_cum = rest_t[order], np.cumsum(rest_c[order])
        # safety net: the exact m must prove no non-fetched bucket is
        # partial at the answer thresholds (checked after solving)
        rest_in = np.maximum(
            np.maximum(mt["lo_v"] - m, m - mt["hi_v"]), 0.0
        )[~in_cand][order]

        dev = np.abs(vs - m)
        dorder = np.argsort(dev, kind="stable")
        dev_s, dc_s = dev[dorder], np.cumsum(vc[dorder])

        def dev_cnt(t: float) -> int:
            fv = int(dc_s[np.searchsorted(dev_s, t, side="right") - 1]) if np.searchsorted(dev_s, t, side="right") else 0
            nf = int(rest_cum[np.searchsorted(rest_t, t, side="right") - 1]) if np.searchsorted(rest_t, t, side="right") else 0
            return fv + nf

        def dev_at(r: int) -> float:
            # smallest fetched deviation whose CDF reaches rank r+1
            lo, hi = 0, len(dev_s) - 1
            while lo < hi:
                mid = (lo + hi) // 2
                if dev_cnt(float(dev_s[mid])) >= r + 1:
                    hi = mid
                else:
                    lo = mid + 1
            return float(dev_s[lo])

        r0, r1 = (n - 1) // 2, n // 2
        d_lo = dev_at(r0)
        d_hi = dev_at(r1) if r1 != r0 else d_lo
        # safety net: any non-fetched bucket partial at the answers?
        bad = ((rest_in <= d_hi) & (d_lo < rest_t)).any()
        if bad:
            return None  # caller re-fetches those buckets
        pos = (n - 1) * 0.5
        frac = pos - math.floor(pos)
        mad = d_lo + frac * (d_hi - d_lo)
        return (n, m, mad)

    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("n", T.LongType()),
            T.StructField("m", T.DoubleType()),
            T.StructField("mad", T.DoubleType()),
        ]
    )
    out_rows: list[tuple] = []
    retry: list[tuple] = []
    solved: dict[tuple, tuple] = {}
    fetched_groups = dict(_groups(fetched, keys))
    for g in meta:
        res = solve(g, fetched_groups[g])
        if res is None:
            retry.append(g)
        else:
            solved[g] = res
    if retry:  # correctness net: widen to ALL buckets for the group
        extra = [
            (*g, int(b)) for g in retry for b in meta[g]["bs"].tolist()
        ]
        for g in retry:
            meta[g]["cand"] = {int(b) for b in meta[g]["bs"].tolist()}
        refetched = dict(_groups(_fetch_values(base, pid, keys, key_fields, extra), keys))
        for g in retry:
            solved[g] = solve(g, refetched[g])
    for g, sub in _groups(census, keys):
        n, m, mad = solved[g]
        out_rows.append((*g, n, m, mad))
    return spark.createDataFrame(out_rows, out_schema)
