"""Reshape / sampling / order-statistic surface: pivot, unpivot,
deterministic sampling, exact percentiles, edit-distance matching,
ordered string aggregation. Rounds out SURVEY.md §2.B shapes the
first two waves didn't exercise.

Scale notes: pivot with an explicit value list is a single hash-agg
(no second pass to discover values — at 100 TB value discovery would
be its own shuffle); unpivot is a zero-shuffle Expand; hash-mod
sampling pushes into the scan and, unlike `TABLESAMPLE`, is
deterministic and joinable (the same keys survive in every table it
is applied to); exact percentiles shuffle once per group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.registry import register
from meepo_spark.queries.exp_frames import REV_ARMS_SQL, user_revenue_arms


@register(
    "v1_pivot_status",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS qty_F,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS qty_O,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'P' THEN CAST(l_quantity AS DECIMAL(18,6)) END), 2) AS DOUBLE) AS qty_P
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def v1_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: quantity by returnflag × linestatus, linestatus values
    spread to columns. The explicit value list keeps it one hash-agg
    (Catalyst lowers pivot to conditional aggregates — exactly the
    oracle's CASE form)."""
    l = table(spark, sf_dir, "lineitem")
    piv = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O", "P"])
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2).cast("double"))
    )
    return piv.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
        F.col("P").alias("qty_P"),
    ).orderBy("l_returnflag")


@register(
    "v2_unpivot_metrics",
    oracle="""
    WITH m AS (
        SELECT o_orderstatus,
               CAST(COUNT(*) AS DOUBLE) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price,
               CAST(ROUND(AVG(o_totalprice), 2) AS DOUBLE) AS avg_price
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, metric, value FROM (
        SELECT o_orderstatus, 'n_orders'    AS metric, n_orders    AS value FROM m
        UNION ALL
        SELECT o_orderstatus, 'total_price' AS metric, total_price AS value FROM m
        UNION ALL
        SELECT o_orderstatus, 'avg_price'   AS metric, avg_price   AS value FROM m
    )
    ORDER BY o_orderstatus, metric
    """,
)
def v2_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot: per-status order metrics melted to (status, metric,
    value) long form — `DataFrame.unpivot`, a zero-shuffle Expand node
    over the already-aggregated (tiny) input."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_price"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )
    return m.unpivot(
        "o_orderstatus",
        ["n_orders", "total_price", "avg_price"],
        "metric",
        "value",
    ).orderBy("o_orderstatus", "metric")


@register(
    "v3_hash_sample",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def v3_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1% systematic sample by key modulus. Unlike
    TABLESAMPLE this is reproducible across engines and runs, pushes
    into the scan, and samples *entities* (whole orders), so sampled
    tables stay joinable on the sampled key."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    return l.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")),
            2,
        )
        .cast("double")
        .alias("revenue"),
    )


@register(
    "v4_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.25) / 100.0, 2) AS p25,
           ROUND(quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.50) / 100.0, 2) AS p50,
           ROUND(quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.75) / 100.0, 2) AS p75,
           ROUND(quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.50)
                 FILTER (WHERE l_discount > 0.05) / 100.0, 2) AS p50_discounted
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def v4_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolating) percentiles per group, including a
    FILTER-ed median — the exact complement to G7's sketch-based
    percentile_approx. Quantiles run over integer cents: linear
    interpolation at quarter fractions over integers is exact in IEEE
    doubles, so both engines produce bit-identical values no matter
    how each factors the interpolation formula (raw doubles put the
    p50 midpoint on a .005 rounding boundary and the engines' last
    bits diverge).

    REWORKED r10 (VERDICT r9 #1/#3): no `F.percentile` — its per-task
    value→count map merges on ONE final task, the documented 100 TB
    OOM shape on near-unique cents. r11: the r10 form melted the
    (all, discounted) measures through a stack() Expand that DOUBLED
    every fact row through both the census and the refine aggregate;
    `exact_quantiles_cdf_multi` reads both measures as weight columns
    in ONE single-width census pass + ONE refine pass — every wide
    stage domain- or bucket-bounded. The 6-row quantile frame pivots
    back to the report shape."""
    from meepo_spark.operators.quantiles import exact_quantiles_cdf_multi
    from meepo_spark.queries.fact_hist import lineitem_cents_hist

    # r11 (second pass): both measures read the shared session-cached
    # (flag, cents) histogram as count weights — zero fact passes in
    # this query once any cents-histogram consumer has run.
    qf = exact_quantiles_cdf_multi(
        lineitem_cents_hist(spark, sf_dir),
        ["l_returnflag"],
        "cents",
        {"all": F.col("n"), "disc": F.col("n_disc")},
        {"q25": 0.25, "q50": 0.50, "q75": 0.75},
    )

    def pick(m: str, c: str):
        return F.max(F.when(F.col("m") == m, F.col(c)))

    return (
        qf.groupBy("l_returnflag")
        .agg(
            F.round(pick("all", "q25") / 100.0, 2).alias("p25"),
            F.round(pick("all", "q50") / 100.0, 2).alias("p50"),
            F.round(pick("all", "q75") / 100.0, 2).alias("p75"),
            F.round(pick("disc", "q50") / 100.0, 2).alias("p50_discounted"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "v5_edit_distance",
    oracle="""
    SELECT levenshtein(p_name, 'small bolt') AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           MIN(p_name) AS example
    FROM part
    WHERE levenshtein(p_name, 'small bolt') <= 6
    GROUP BY dist
    ORDER BY dist
    """,
)
def v5_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance matching: parts within Levenshtein distance 6 of
    a probe string, bucketed by distance. The fuzzy-string primitive
    for entity resolution; at scale the probe side is a broadcast list
    and the distance threshold gates a candidate join."""
    p = table(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("small bolt"))
    return (
        p.select(dist.alias("dist"), "p_name")
        .filter(F.col("dist") <= 6)
        .groupBy("dist")
        .agg(F.count("*").alias("n_parts"), F.min("p_name").alias("example"))
        .orderBy("dist")
    )


@register(
    "v6_listagg_types",
    oracle="""
    SELECT p_brand,
           string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types,
           CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types
    FROM part
    WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def v6_listagg_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): distinct part types per
    brand, sorted then joined — collect_set + array_sort + array_join
    keeps the result deterministic under any partitioning (an unsorted
    listagg would be nondeterministic at any scale)."""
    p = table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    return (
        p.groupBy("p_brand")
        .agg(
            F.array_join(F.array_sort(F.collect_set("p_type")), ",").alias("types"),
            F.countDistinct("p_type").alias("n_types"),
        )
        .orderBy("p_brand")
    )


@register(
    "v7_stratified_holdout",
    oracle="""
    WITH ranked AS (
        SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                           doc_id ASC) AS rn
        FROM documents
    )
    SELECT lang, doc_id, h
    FROM ranked
    WHERE rn <= 20
    """,
)
def v7_stratified_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified EXACT-size sampling: 20 docs per language, selected
    by md5(doc_id) order — a deterministic pseudo-random permutation
    both engines compute identically, so the holdout is reproducible
    forever from the data alone (no seed state, no RNG library). This
    is how a training pipeline pins per-language eval splits: add
    docs and the holdout only changes where new hashes displace old
    ones, never from partitioning or execution order.

    One window shuffle keyed on the stratum; at 100 TB you'd pre-rank
    with a per-partition top-20 heap (the o2 top-k-per-group shape)
    before the global window to keep the shuffle at k×|strata| rows.
    """
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )


@register(
    "v8_histogram",
    oracle="""
    WITH b AS (
        SELECT LEAST(CAST(FLOOR(l_extendedprice / 5000) AS INT), 19) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1
    )
    SELECT bucket,
           bucket * 5000 AS lo,
           (bucket + 1) * 5000 AS hi,
           n,
           CAST(SUM(n) OVER (ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_n,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER () + 1e-9, 4) AS share
    FROM b
    """,
)
def v8_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8: equi-width histogram with cumulative distribution — the
    binning primitive behind feature bucketization, data profiling,
    and approximate-quantile sanity checks. Fixed-width buckets
    (width 5000, last bucket open-ended via LEAST) mean bucket
    assignment is a pure projection — no pre-pass for min/max, so
    the whole histogram is ONE scan + a 20-row aggregate, and the
    cumulative/share windows run on the 20-row result, not the fact
    table. Integer counts are exact; only the share is floating
    (rounded)."""
    li = table(spark, sf_dir, "lineitem")
    b = li.groupBy(
        F.least(
            F.floor(F.col("l_extendedprice") / 5000).cast("int"), F.lit(19)
        ).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return b.select(
        "bucket",
        (F.col("bucket") * 5000).alias("lo"),
        ((F.col("bucket") + 1) * 5000).alias("hi"),
        "n",
        F.sum("n").over(cum).alias("cum_n"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(W.partitionBy()) + 1e-9, 4
        ).alias("share"),
    )


@register(
    "v9_weighted_sample",
    oracle="""
    WITH u AS (
        SELECT lang, doc_id, n_chars,
               ((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 1048576.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 65536.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 4096.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 256.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 16.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1)
              + 1.0) / 16777217.0 AS uval
        FROM documents
    ),
    keyed AS (
        SELECT lang, doc_id, n_chars,
               POW(uval, 1.0 / n_chars) AS k
        FROM u
    ),
    ranked AS (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY k DESC, doc_id) AS rn
        FROM keyed
    )
    SELECT lang, doc_id, n_chars, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 20
    """,
)
def v9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V9: weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): per-language top-20 docs by the key u^(1/w) with weight
    w = n_chars, so longer documents are proportionally likelier —
    the standard trick behind weighted training-mix draws, where a
    plain `ORDER BY rand()` cannot honor weights and cannot be
    reproduced.

    u is derived from md5(doc_id) (6 nibbles → (0,1], never exactly
    0 so the pow is defined), making the draw DETERMINISTIC across
    engines, runs, and partitionings — reproducibility is the whole
    point for training-data lineage. One projection computes the
    key; the only shuffle is the per-lang top-k (W1 pattern). A-ES
    keys are independent per row, so at 100 TB the same query
    streams: keep a bounded per-lang heap per partition, merge heaps
    at the end (the map-side-combine shape of O2)."""
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    uval = (
        F.conv(F.substring(h, 1, 6), 16, 10).cast("double") + 1.0
    ) / 16777217.0
    keyed = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.pow(uval, 1.0 / F.col("n_chars")).alias("k"),
    )
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(F.col("k").desc(), "doc_id")
    )
    return (
        keyed.withColumn("rn", rn)
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id", "n_chars", F.col("rn").cast("int").alias("rn"))
    )


@register(
    "v10_winsorize",
    oracle="""
    WITH cents AS (
        SELECT c_mktsegment, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c
        FROM customer
    ),
    bounds AS (
        SELECT c_mktsegment,
               quantile_cont(c, 0.05) AS lo,
               quantile_cont(c, 0.95) AS hi
        FROM cents GROUP BY c_mktsegment
    )
    SELECT t.c_mktsegment,
           COUNT(*)                                                  AS n,
           ROUND(AVG(t.c) / 100.0 + 1e-9, 2)                         AS avg_raw,
           ROUND(AVG(GREATEST(LEAST(t.c * 1.0, b.hi), b.lo)) / 100.0 + 1e-9, 2) AS avg_winsor,
           CAST(SUM(CASE WHEN t.c < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
           CAST(SUM(CASE WHEN t.c > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high
    FROM cents t JOIN bounds b USING (c_mktsegment)
    GROUP BY t.c_mktsegment
    """,
)
def v10_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V10: per-group winsorization — clamp account balances to the
    group's [p05, p95] band and report the robust vs raw mean plus
    clamp counts. The outlier-capping primitive every feature pipeline
    needs before a scale-sensitive model sees the data.

    Determinism: percentiles interpolate over integer cents (exact in
    IEEE doubles, same discipline as v4). Optimization r11 (VERDICT
    r10 #3): `F.percentile`'s per-segment value→count map over
    near-unique customer-grain cents was the weakly-bounded shape
    retired everywhere this round — the bounds now come from the
    census+refine operator over the checkpointed 2-column projection
    (the narrow scan is materialized once and every pass reads it),
    and remain a 5-row relation joined back broadcast."""
    from meepo_spark.operators.quantiles import exact_quantiles_cdf

    c = table(spark, sf_dir, "customer").select(
        "c_mktsegment", F.round(F.col("c_acctbal") * 100).cast("long").alias("c")
    ).localCheckpoint()
    bounds = exact_quantiles_cdf(
        c, ["c_mktsegment"], "c", {"lo": 0.05, "hi": 0.95}
    ).select("c_mktsegment", "lo", "hi")
    j = c.join(F.broadcast(bounds), "c_mktsegment")  # bcast: fixed (5 mktsegments)
    clamped = F.greatest(F.least(F.col("c") * 1.0, F.col("hi")), F.col("lo"))
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("c") / 100.0 + F.lit(1e-9), 2).alias("avg_raw"),
        F.round(F.avg(clamped) / 100.0 + F.lit(1e-9), 2).alias("avg_winsor"),
        F.sum(F.when(F.col("c") < F.col("lo"), 1).otherwise(0)).alias("n_clamped_low"),
        F.sum(F.when(F.col("c") > F.col("hi"), 1).otherwise(0)).alias("n_clamped_high"),
    )


@register(
    "v11_equidepth_histogram",
    oracle="""
    WITH cents AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    tiled AS (
        SELECT l_returnflag, c,
               NTILE(10) OVER (PARTITION BY l_returnflag
                               ORDER BY c ASC, l_orderkey ASC, l_linenumber ASC) AS decile
        FROM cents
    )
    SELECT l_returnflag,
           CAST(decile AS BIGINT)       AS decile,
           COUNT(*)                     AS n,
           ROUND(MIN(c) / 100.0, 2)     AS lo,
           ROUND(MAX(c) / 100.0, 2)     AS hi
    FROM tiled
    GROUP BY l_returnflag, decile
    """,
)
def v11_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V11: equi-DEPTH histogram (complement of v8's equi-width):
    NTILE(10) over a total order — (value, pk) so ties split
    deterministically — yields per-decile counts and value bounds,
    i.e. the distribution summary optimizers store as equi-height
    histograms.

    Scale shape (r3): NTILE partitioned by the 3-value returnflag is
    a near-global sort in disguise, so the decile comes from the o7
    bucketed enumeration GROUPED per flag — equal-width cents buckets
    from a per-flag (lo, hi, N) broadcast, per-(flag, bucket) counts
    -> per-flag running offsets (32-row window), within-bucket
    row_number + offset = exact global rank, and NTILE(10) is the
    closed-form function of (rank, N): the first N%10 deciles take
    ceil(N/10) rows. Bit-identical to the oracle's NTILE because the
    (c, orderkey, linenumber) tie order is total."""
    from meepo_spark.operators.enumeration import bucketed_ntile

    l = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        "l_orderkey", "l_linenumber",
    )
    tiled = bucketed_ntile(
        l, F.col("c"),
        [F.col("c").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        10, ("l_returnflag",), out="t10",
    )
    return (
        tiled.withColumn("decile", F.col("t10").cast("long"))
        .groupBy("l_returnflag", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c") / 100.0, 2).alias("lo"),
            F.round(F.max("c") / 100.0, 2).alias("hi"),
        )
    )


def _hex2_sql(h: str, rep: str) -> str:
    """DuckDB: hex digits (2*rep+1, 2*rep+2) of an md5 hex string as an
    integer in [0, 256) — the same value Spark's
    conv(substring(h, 2*rep+1, 2), 16, 10) yields."""
    d1 = f"(instr('0123456789abcdef', substr({h}, 2*{rep} + 1, 1)) - 1)"
    d2 = f"(instr('0123456789abcdef', substr({h}, 2*{rep} + 2, 1)) - 1)"
    return f"({d1} * 16.0 + {d2})"


# Poisson(1) inverse-CDF thresholds (cumulative probabilities) — the
# SAME literals on both engines, so the per-(row, replicate) weights
# are bit-identical everywhere. u is quantized to 8 bits (one md5 per
# ROW serves all 16 replicates, 2 hex digits each); the ~0.2% CDF
# quantization bias is identical on both engines and immaterial for a
# bootstrap, while cutting the hash cost 16×.
_POIS1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119,
)
_N_REPS = 16


def _pois_case_sql(u: str) -> str:
    cases = "".join(
        f" WHEN {u} < {c} THEN {i}" for i, c in enumerate(_POIS1_CDF)
    )
    return f"(CASE{cases} ELSE 7 END)"


_V12_U = _hex2_sql("h", "rep") + " / 256.0"

_V12_ORACLE = f"""
    WITH hashed AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
               md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)) AS h
        FROM lineitem
    ),
    weighted AS (
        SELECT t.rep, cents, {_pois_case_sql(_V12_U)} AS w
        FROM hashed, range({_N_REPS}) t(rep)
    ),
    rep_means AS (
        SELECT rep,
               CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_cents
        FROM weighted GROUP BY rep
    ),
    point AS (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_cents
        FROM hashed
    )
    SELECT p.n_rows,
           ROUND(p.mean_cents / 100.0 + 1e-9, 2)                        AS point_mean,
           ROUND(quantile_cont(r.mean_cents, 0.025) / 100.0 + 1e-9, 2)  AS boot_lo,
           ROUND(quantile_cont(r.mean_cents, 0.975) / 100.0 + 1e-9, 2)  AS boot_hi,
           ROUND(stddev_samp(r.mean_cents) / 100.0 + 1e-9, 2)           AS boot_se
    FROM rep_means r CROSS JOIN point p
    GROUP BY p.n_rows, p.mean_cents
"""


@register("v12_poisson_bootstrap", oracle=_V12_ORACLE)
def v12_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V12: Poisson bootstrap confidence interval for the mean — the
    scalable bootstrap: instead of resampling n rows per replicate
    (impossible distributed), every row draws an independent
    Poisson(1) weight per replicate, so all 16 replicates are computed
    in ONE pass over the fact with a (rep)-keyed aggregate. Weights
    come from md5-derived uniforms through a shared inverse-CDF table,
    making the resampling bit-reproducible across engines — a seeded
    RNG could never be oracle-checked. ONE md5 per row serves all 16
    replicates (2 hex digits each — the explode-of-array barrier pins
    the digest before the replicate explode so CollapseProject cannot
    inline it 16×); the 8-bit uniform's CDF quantization is identical
    on both engines.

    Scale shape: the explode multiplies the scan by n_reps map-side
    (no shuffle amplification — the shuffle carries 16 partial
    moment rows); at 100 TB you'd fold the weight draw into the same
    scan as any other metric. Replicate means are integer-moment
    ratios, so the only float ops happen on the 16-row result."""
    l = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        "l_orderkey", "l_linenumber",
    )
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    # Generate-node barrier: without it the md5 would be inlined into
    # the post-explode projection and recomputed per replicate.
    # spread(): the fixture arrives as few byte-sized scan splits, which
    # would serialize the 16× explode+CASE kernel on a few cores.
    from meepo_spark.catalog import spread

    hashed = spread(l, "l_orderkey").select(
        "cents", F.explode(F.array(F.md5(key))).alias("h")
    )
    reps = hashed.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(_N_REPS - 1))))
    u = F.conv(F.substring(F.col("h"), 2 * F.col("rep") + 1, 2), 16, 10).cast("double") / 256.0
    w = F.lit(7)
    for i in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < _POIS1_CDF[i], i).otherwise(w)
    rep_means = (
        reps.withColumn("w", w)
        .groupBy("rep")
        .agg(
            (
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / F.sum("w").cast("double")
            ).alias("mean_cents")
        )
    )
    point = hashed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("pmean"),
    )
    return (
        rep_means.crossJoin(F.broadcast(point))  # bcast: fixed (1-row point)
        .groupBy("n_rows", "pmean")
        .agg(
            F.percentile(F.col("mean_cents"), F.lit(0.025)).alias("qlo"),
            F.percentile(F.col("mean_cents"), F.lit(0.975)).alias("qhi"),
            F.stddev_samp("mean_cents").alias("sd"),
        )
        .select(
            "n_rows",
            F.round(F.col("pmean") / 100.0 + F.lit(1e-9), 2).alias("point_mean"),
            F.round(F.col("qlo") / 100.0 + F.lit(1e-9), 2).alias("boot_lo"),
            F.round(F.col("qhi") / 100.0 + F.lit(1e-9), 2).alias("boot_hi"),
            F.round(F.col("sd") / 100.0 + F.lit(1e-9), 2).alias("boot_se"),
        )
    )

@register(
    "v16_ab_proportion_ztest",
    oracle="""
    WITH arms AS (
        SELECT user_id % 2 AS arm,
               MAX(CASE WHEN event_type = 'purchase' AND value > 200
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    stats AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c1
        FROM arms
    )
    SELECT n0, c0, n1, c1,
           ROUND(c0 * 1.0 / n0 + 1e-9, 4) AS p0,
           ROUND(c1 * 1.0 / n1 + 1e-9, 4) AS p1,
           ROUND((c0 * 1.0 / n0 - c1 * 1.0 / n1)
                 / sqrt(((c0 + c1) * 1.0 / (n0 + n1))
                        * (1.0 - (c0 + c1) * 1.0 / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)) + 1e-9, 4) AS z_stat
    FROM stats
    """,
)
def v16_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V16: two-proportion z-test — the A/B experiment readout
    (conversion rate per arm + the pooled z statistic), computed from
    per-user conversion flags with a deterministic hash-assignment
    stand-in for the experiment bucketing (user_id parity). What an
    experimentation platform runs per metric per day.

    Scale shape: one per-user aggregate (map-side combine), then a
    1-row arm census — every float op runs once on that single row.
    sqrt is IEEE-correctly-rounded on both engines and the divisions
    are identical left-to-right chains, so the statistic matches
    bit-for-bit before the 4dp round."""
    arms = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            # high-value purchases only: plain 'any purchase' converts
            # ~100% of this fixture's users, collapsing the pooled
            # variance to zero (sqrt(0) division)
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 200),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .select((F.col("user_id") % 2).alias("arm"), "converted")
    )
    stats = arms.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias("c1"),
    )
    p0 = F.col("c0") / F.col("n0")
    p1 = F.col("c1") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    z = (p0 - p1) / F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    return stats.select(
        "n0", "c0", "n1", "c1",
        F.round(p0 + 1e-9, 4).alias("p0"),
        F.round(p1 + 1e-9, 4).alias("p1"),
        F.round(z + 1e-9, 4).alias("z_stat"),
    )


@register(
    "v20_mode_percentile_disc",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, CAST(ROUND(l_quantity) AS BIGINT) AS q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag, q
    )
    SELECT c.l_returnflag,
           MIN({'nn': -n, 'q': q}).q        AS mode_qty,
           -MIN({'nn': -n, 'q': q}).nn      AS mode_count,
           d.p50, d.p90
    FROM c
    JOIN (
        SELECT l_returnflag,
               CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.5) AS BIGINT) AS p50,
               CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.9) AS BIGINT) AS p90
        FROM lineitem GROUP BY l_returnflag
    ) d USING (l_returnflag)
    GROUP BY c.l_returnflag, d.p50, d.p90
    """,
)
def v20_mode_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V20: modal value and DISCRETE percentiles per group — the two
    order statistics v4's interpolating quantiles don't give: the
    most frequent actual value (mode, ties broken to the SMALLEST
    value via a (−count, value) struct-min — builtin mode() is
    tie-nondeterministic on both engines) and the smallest value
    whose cumulative frequency reaches p (percentile_disc ≡ DuckDB
    quantile_disc, verified to share the lower-bound convention —
    always a value that EXISTS, which is what inventory/SKU style
    reporting needs). Mode reduces the fact to a value-count table
    first (map-side combined); the discrete percentiles are one
    value-map aggregate."""
    # ROUND before the double->BIGINT cast on BOTH sides (the dq6
    # trap: bare casts truncate in Spark but round in DuckDB)
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.round(F.col("l_quantity")).cast("long").alias("q")
    )
    c = li.groupBy("l_returnflag", "q").agg(F.count(F.lit(1)).alias("n"))
    top = F.min(F.struct((-F.col("n")).alias("nn"), F.col("q")))
    modes = c.groupBy("l_returnflag").agg(
        top["q"].alias("mode_qty"), (-top["nn"]).alias("mode_count")
    )
    disc = li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY q)")
        .cast("long")
        .alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY q)")
        .cast("long")
        .alias("p90"),
    )
    return modes.join(disc, "l_returnflag")


@register(
    "v21_beta_posterior",
    oracle="""
    WITH arms AS (
        SELECT user_id % 4 AS arm,
               MAX(CASE WHEN event_type = 'purchase' AND value > 200
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(converted) AS BIGINT) AS x
        FROM arms GROUP BY arm
    )
    SELECT CAST(arm AS BIGINT) AS arm, n, x,
           ROUND((2.0 + x) / (4.0 + n), 6) + 0.0              AS post_mean,
           ROUND((2.0 + x) * (2.0 + n - x)
                 / ((4.0 + n) * (4.0 + n) * (5.0 + n)), 6) + 0.0 AS post_var,
           ROUND((2.0 + x) / (4.0 + n)
                 - 1.96 * sqrt((2.0 + x) * (2.0 + n - x)
                               / ((4.0 + n) * (4.0 + n) * (5.0 + n))), 6) + 0.0
               AS ci_lo,
           ROUND((2.0 + x) / (4.0 + n)
                 + 1.96 * sqrt((2.0 + x) * (2.0 + n - x)
                               / ((4.0 + n) * (4.0 + n) * (5.0 + n))), 6) + 0.0
               AS ci_hi
    FROM s
    """,
)
def v21_beta_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V21: Bayesian conversion posterior per experiment arm — a
    Beta(2,2) prior updated with each arm's (conversions, exposures)
    in closed form: posterior mean (a+x)/(a+b+n), exact posterior
    variance, and a normal-approximation 95% credible interval. The
    frequentist z-test twin is v16; this is what a sequential-decision
    dashboard reads (no p-value gymnastics at interim looks). The
    whole computation is two exact integer aggregates (per-user
    conversion collapse, per-arm counts) followed by scalar
    arithmetic on a #arms-row frame — at 100 TB the plan is one
    user-keyed shuffle and a 4-row result; the posterior math costs
    nothing and is engine-exact (rational arithmetic in double,
    rounded)."""
    e = table(spark, sf_dir, "events")
    arms = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 200), 1
            ).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 4).alias("arm"), "converted")
    s = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").cast("long").alias("x")
    )
    a = 2.0 + F.col("x")
    b = 2.0 + F.col("n") - F.col("x")
    tot = 4.0 + F.col("n")
    mean = a / tot
    var = a * b / (tot * tot * (tot + 1.0))
    return s.select(
        F.col("arm").cast("long").alias("arm"),
        "n",
        "x",
        (F.round(mean, 6) + 0.0).alias("post_mean"),
        (F.round(var, 6) + 0.0).alias("post_var"),
        (F.round(mean - 1.96 * F.sqrt(var), 6) + 0.0).alias("ci_lo"),
        (F.round(mean + 1.96 * F.sqrt(var), 6) + 0.0).alias("ci_hi"),
    )


@register(
    "v22_chi_square_independence",
    oracle="""
    WITH obs AS (
        SELECT event_type, isodow(ts) - 1 AS wd,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
    ct AS (SELECT wd, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    cells AS (
        SELECT obs.event_type, obs.o,
               (rt.r * 1.0 * ct.c) / n.n AS e
        FROM obs JOIN rt USING (event_type) JOIN ct USING (wd) CROSS JOIN n
    )
    SELECT event_type,
           CAST(SUM(o) AS BIGINT)                             AS n_rows,
           ROUND(SUM((o - e) * (o - e) / e) + 1e-9, 4) + 0.0  AS chi2_contrib
    FROM cells GROUP BY event_type
    """,
)
def v22_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V22: χ² test of independence between event type and weekday —
    'does behavior shift by day of week?', the categorical counterpart
    to v16's proportion z-test (dof = (types−1)(weekdays−1); compare
    the summed statistic to the χ² critical value offline). Emitted
    per event type so the contribution decomposition shows WHICH
    behavior carries the dependence.

    Scale shape: one (type, weekday) hash aggregate over the fact,
    then all arithmetic on the ≤ |types|×7 cell grid with 1-row /
    per-axis broadcasts — the fact is scanned once. Weekday via
    F.weekday ≡ isodow−1 (the t28 cross-engine convention; dayofweek
    DIFFERS between the engines). Counts exact; expected cells are
    products of exact integers divided once; the statistic rounds at
    4dp with +0.0."""
    e = table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.weekday("ts").alias("wd")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    ct = obs.groupBy("wd").agg(F.sum("o").cast("long").alias("c"))
    n = obs.agg(F.sum("o").cast("long").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "event_type")  # bcast: fixed (per-type totals)
        .join(F.broadcast(ct), "wd")  # bcast: fixed (7 weekdays)
        .crossJoin(F.broadcast(n))  # bcast: fixed (1-row total)
        .select(
            "event_type",
            "o",
            ((F.col("r") * 1.0 * F.col("c")) / F.col("n")).alias("e"),
        )
    )
    return cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("n_rows"),
        (
            F.round(
                F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
                + 1e-9,
                4,
            )
            + 0.0
        ).alias("chi2_contrib"),
    )


@register(
    "v23_ab_power_mde",
    oracle="""
    WITH arms AS (
        SELECT user_id % 2 AS arm,
               MAX(CASE WHEN event_type = 'purchase' AND value > 200
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    stats AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) * 1.0
                   / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS p0
        FROM arms
    ),
    calc AS (
        SELECT n0, n1, p0,
               sqrt(p0 * (1.0 - p0) * (1.0 / n0 + 1.0 / n1)) AS se,
               (1.959964 + 0.841621)
                   * sqrt(p0 * (1.0 - p0) * (1.0 / n0 + 1.0 / n1)) AS mde,
               (1.959964 + 0.841621) * (1.959964 + 0.841621)
                   * (p0 * (1.0 - p0) + (p0 + 0.02) * (1.0 - (p0 + 0.02)))
                   / (0.02 * 0.02) AS n_req
        FROM stats
    )
    SELECT n0, n1,
           ROUND(p0 + 1e-9, 4) AS p0_r,
           ROUND(se + 1e-9, 6) AS se_r,
           ROUND(mde + 1e-9, 6) AS mde_abs_r,
           ROUND(mde / p0 + 1e-9, 4) AS mde_rel_r,
           CAST(CEIL(ROUND(n_req, 6)) AS BIGINT) AS n_per_arm_2pp
    FROM calc
    """,
)
def v23_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V23: experiment power analysis — the question asked BEFORE
    v16's z-test is run: with these arm sizes and baseline conversion,
    what's the minimum detectable effect at alpha=0.05 two-sided /
    80% power (MDE = (z_.975 + z_.80)·SE, normal approximation), and
    how many users per arm would a 2pp absolute lift need? The
    go/no-go arithmetic every experimentation platform bakes next to
    the test itself; z constants are shared literal text on both
    engines (the Holt-constants single-sourcing concern doesn't apply
    to two numbers used once, but the 6dp-round-before-CEIL does:
    CEIL on a raw float ratio could flip on ~1e-12 cross-engine
    drift, so both sides quantize first — the dq6 ROUND-before-cast
    trap, integer edition).

    Scale shape: one per-user aggregate (the same shuffle v16 rides),
    then a 1-row scalar computation — nothing here grows with
    anything but user count."""
    ev = table(spark, sf_dir, "events")
    # per-user conversion first (MAX over the user's events), then arms
    users = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") > 200)
            ).cast("int")
        ).alias("converted")
    )
    stats = users.agg(
        F.sum(((F.col("user_id") % 2) == 0).cast("int"))
        .cast("long")
        .alias("n0"),
        F.sum(((F.col("user_id") % 2) == 1).cast("int"))
        .cast("long")
        .alias("n1"),
        (
            F.sum(
                F.when((F.col("user_id") % 2) == 0, F.col("converted")).otherwise(0)
            )
            * 1.0
            / F.sum(((F.col("user_id") % 2) == 0).cast("int"))
        ).alias("p0"),
    )
    z = F.lit(1.959964 + 0.841621)
    se = F.sqrt(
        F.col("p0") * (1.0 - F.col("p0")) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    p1 = F.col("p0") + 0.02
    n_req = (
        z
        * z
        * (F.col("p0") * (1.0 - F.col("p0")) + p1 * (1.0 - p1))
        / F.lit(0.02 * 0.02)
    )
    return stats.select(
        "n0",
        "n1",
        F.round(F.col("p0") + 1e-9, 4).alias("p0_r"),
        F.round(se + 1e-9, 6).alias("se_r"),
        F.round(z * se + 1e-9, 6).alias("mde_abs_r"),
        F.round(z * se / F.col("p0") + 1e-9, 4).alias("mde_rel_r"),
        F.ceil(F.round(n_req, 6)).cast("long").alias("n_per_arm_2pp"),
    )


@register(
    "v24_mann_whitney_u",
    oracle=f"""
    WITH rev AS ({REV_ARMS_SQL}),
    vm AS (
        SELECT cents,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(arm) AS BIGINT) AS c1
        FROM rev GROUP BY cents
    ),
    c AS (
        SELECT cents, cnt, c1,
               COALESCE(SUM(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cb
        FROM vm
    ),
    agg AS (
        SELECT SUM(cnt)                              AS n,
               SUM(c1)                               AS n1,
               SUM(cnt) - SUM(c1)                    AS n0,
               SUM((cb + (cnt + 1) / 2.0) * c1)      AS r1,
               SUM(CAST(cnt AS DOUBLE) * cnt * cnt - cnt) AS tie
        FROM c
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           r1 - n1 * (n1 + 1) / 2.0 AS u_stat,
           ROUND((r1 - n1 * (n1 + 1) / 2.0 - n0 * n1 / 2.0)
                 / sqrt((n0 * n1 / 12.0)
                        * ((n + 1) - tie / (n * (n - 1.0)))) + 1e-9, 4)
               AS z_r
    FROM agg
    """,
)
def v24_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V24: exact Mann–Whitney U (Wilcoxon rank-sum) with tie
    correction — the nonparametric A/B test for the heavy-tailed
    per-user revenue metric where v16's proportion z-test and a
    t-test both mislead. Average ranks come from the VALUE MAP
    (distinct cents -> count), not a row-level sort: avg_rank(v) =
    count_below(v) + (count(v)+1)/2, the same rank-before shape l21's
    AUC uses (AUC and U are affine twins; this query adds the
    hypothesis-test form: tie-corrected sigma and the z statistic).

    Determinism is EXACT, not rounded: every avg rank is an integer
    or half-integer, all products/sums stay far below 2^52, so r1,
    U, and the tie term are exact doubles on both engines regardless
    of summation order — z rounds at 4dp for display only. Scale
    shape: one per-user shuffle, one value-map aggregate, and
    `bucketed_prefix_sum` over 32768-cent bands for count-below (the
    g11/v13/l21 discipline — distinct revenue values grow with users,
    never 'small'); no single-task sort anywhere."""
    from meepo_spark.operators.enumeration import bucketed_prefix_sum

    rev = user_revenue_arms(spark, sf_dir)
    vm = rev.groupBy("cents").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("arm").alias("c1")
    )
    c = bucketed_prefix_sum(
        vm,
        bucket=F.floor(F.col("cents") / 32768),
        order_cols=[F.col("cents").asc()],
        vals={"cb": "cnt"},
        frame_end=-1,
    )
    agg = c.agg(
        F.sum("cnt").alias("n"),
        F.sum("c1").alias("n1"),
        (F.sum("cnt") - F.sum("c1")).alias("n0"),
        F.sum((F.col("cb") + (F.col("cnt") + 1) / 2.0) * F.col("c1")).alias(
            "r1"
        ),
        F.sum(
            F.col("cnt").cast("double") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).alias("tie"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    mu = F.col("n0") * F.col("n1") / 2.0
    sigma = F.sqrt(
        (F.col("n0") * F.col("n1") / 12.0)
        * (
            (F.col("n") + 1)
            - F.col("tie") / (F.col("n") * (F.col("n") - 1.0))
        )
    )
    return agg.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        u.alias("u_stat"),
        F.round((u - mu) / sigma + 1e-9, 4).alias("z_r"),
    )


@register(
    "v25_cuped_adjustment",
    oracle="""
    WITH rev AS (
        SELECT user_id, user_id % 2 AS arm,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                              AND CAST(ts AS DATE) < DATE '2024-01-16'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                              AND CAST(ts AS DATE) >= DATE '2024-01-16'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT AVG(x) AS mx, AVG(y) AS my,
               AVG(x * x) - AVG(x) * AVG(x) AS vx,
               AVG(y * y) - AVG(y) * AVG(y) AS vy,
               AVG(x * y) - AVG(x) * AVG(y) AS cxy
        FROM rev
    ),
    a AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               AVG(x) AS amx, AVG(y) AS amy
        FROM rev GROUP BY arm
    )
    SELECT a.arm, a.n,
           ROUND(a.amy / 100.0 + 1e-9, 4) AS mean_y_r,
           ROUND((a.amy - (g.cxy / g.vx) * (a.amx - g.mx)) / 100.0 + 1e-9, 4)
               AS mean_y_adj_r,
           ROUND(g.cxy / g.vx + 1e-9, 4) AS theta_r,
           ROUND(g.cxy * g.cxy / (g.vx * g.vy) + 1e-9, 4) AS var_reduction_r
    FROM a CROSS JOIN g
    """,
)
def v25_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V25: CUPED variance reduction — adjust each arm's experiment-
    period revenue by the pre-period covariate (theta = cov(x,y)/
    var(x); days 1-15 predict days 16-30), the standard trick that
    shrinks an A/B test's required sample by the squared pre/post
    correlation (reported here as var_reduction = corr², the fraction
    of outcome variance the covariate removes). Completes the
    experimentation shelf: v16 (test), v23 (power), e20 (QTE), v24
    (rank test), v25 (variance reduction).

    Everything derives from ONE per-user aggregate and its moments —
    the adjusted arm mean is amy − θ(amx − mx) and the variance
    reduction is cov²/(vx·vy), so no second per-row pass and no
    per-row rounded values (the dq14 drift-probability discipline:
    only per-arm/global aggregates are emitted, each rounded with the
    nudge). Scale shape: one user-keyed shuffle, then 2-row × 1-row
    scalar algebra."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    is_p = F.col("event_type") == "purchase"
    pre = F.to_date("ts") < F.lit("2024-01-16").cast("date")
    rev = ev.groupBy("user_id").agg(
        F.sum(F.when(is_p & pre, cents).otherwise(F.lit(0)))
        .cast("long")
        .alias("x"),
        F.sum(F.when(is_p & ~pre, cents).otherwise(F.lit(0)))
        .cast("long")
        .alias("y"),
    ).select((F.col("user_id") % 2).alias("arm"), "x", "y")
    g = rev.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("vx"),
        (F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias("vy"),
        (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")).alias("cxy"),
    )
    a = rev.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("amx"),
        F.avg("y").alias("amy"),
    )
    theta = F.col("cxy") / F.col("vx")
    return a.crossJoin(F.broadcast(g)).select(  # bcast: fixed (1-row moments)
        "arm",
        "n",
        F.round(F.col("amy") / 100.0 + 1e-9, 4).alias("mean_y_r"),
        F.round(
            (F.col("amy") - theta * (F.col("amx") - F.col("mx"))) / 100.0
            + 1e-9,
            4,
        ).alias("mean_y_adj_r"),
        F.round(theta + 1e-9, 4).alias("theta_r"),
        F.round(
            F.col("cxy") * F.col("cxy") / (F.col("vx") * F.col("vy")) + 1e-9, 4
        ).alias("var_reduction_r"),
    )


# --- v26: Benjamini-Hochberg FDR across the experiment metric grid ----

_BH_SQL = """
    WITH cells AS (
        SELECT event_type, MONTH(ts) AS mo,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN user_id % 2 = 1 AND value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM events GROUP BY event_type, MONTH(ts)
    ),
    tested AS (
        SELECT event_type, mo, n0, c0, n1, c1,
               CAST(c0 + c1 AS DOUBLE) / (n0 + n1) AS pool
        FROM cells
        WHERE n0 > 0 AND n1 > 0 AND c0 + c1 > 0 AND c0 + c1 < n0 + n1
    ),
    zs AS (
        SELECT event_type, mo,
               abs((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                   / sqrt(pool * (CAST(1 AS DOUBLE) - pool)
                          * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)))
                   AS az
        FROM tested
    ),
    ks AS (SELECT event_type, mo, az,
                  CAST(1 AS DOUBLE)
                  / (CAST(1 AS DOUBLE) + CAST(0.2316419 AS DOUBLE) * az) AS k
           FROM zs),
    ps AS (
        SELECT event_type, mo, az,
               CAST(2 AS DOUBLE)
                   * (exp(-(az * az) / CAST(2 AS DOUBLE))
                      / sqrt(CAST(2 AS DOUBLE) * pi()))
                   * (((((CAST(1.330274429 AS DOUBLE) * k
                          - CAST(1.821255978 AS DOUBLE)) * k
                         + CAST(1.781477937 AS DOUBLE)) * k
                        - CAST(0.356563782 AS DOUBLE)) * k
                       + CAST(0.319381530 AS DOUBLE)) * k) AS p
        FROM ks
    ),
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ps),
    ranked AS (
        SELECT event_type, mo, az, p,
               CAST(ROW_NUMBER() OVER
                    (ORDER BY p ASC, event_type ASC, mo ASC) AS BIGINT) AS rnk
        FROM ps
    ),
    flagged AS (
        SELECT r.event_type, r.mo, r.az, r.p, r.rnk, mm.m,
               (r.p <= r.rnk * CAST(0.05 AS DOUBLE) / mm.m) AS ok
        FROM ranked r CROSS JOIN mm
    ),
    kstar AS (
        SELECT COALESCE(MAX(rnk), CAST(0 AS BIGINT)) AS ks
        FROM flagged WHERE ok
    )
    SELECT f.event_type, CAST(f.mo AS BIGINT) AS mo,
           ROUND(f.az + 1e-9, 4) + 0.0 AS abs_z,
           ROUND(f.p + 1e-9, 6) + 0.0 AS p_value,
           f.rnk, f.m,
           (f.rnk <= k.ks) AS rejected
    FROM flagged f CROSS JOIN kstar k
"""


@register("v26_bh_fdr", oracle=_BH_SQL)
def v26_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V26: Benjamini-Hochberg FDR step-up over the full experiment
    metric grid — v16 reads ONE z-test; a real experimentation
    platform reads dozens per day (here: conversion z per (event_type,
    month) cell, hash-parity arms) and without multiplicity control
    the 5%-level false positives scale with the grid. BH: rank the
    two-sided p-values ascending, find the largest rank with
    p <= rank*alpha/m, reject everything at or below it.

    Cross-engine p-values: the normal tail is the Abramowitz-Stegun
    26.2.17 polynomial written ONCE as shared SQL text and executed
    verbatim by BOTH engines (the sql9 shared-dialect discipline), so
    the only divergence source is libm exp ulps — absorbed by the 6dp
    round, while ranks/rejections compare exactly. Degenerate cells
    (empty arm, all-convert, none-convert) are excluded from m on both
    sides — the 0/0 NULL-vs-NaN trap cut, not papered over.

    Scale shape: one map-side-combined aggregate collapses the fact to
    the metric grid (<= |types| x 12 rows at ANY corpus size); the
    ranking window and the two scalar broadcasts run on that bounded
    grid. The WindowExec input is grid-bounded — waived with a runtime
    bound in tests/test_window_waivers.py."""
    from meepo_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_BH_SQL)


# --- v27: Welch's unequal-variance t-test (round 8) --------------------

_WELCH_SQL = f"""
    WITH arms AS ({REV_ARMS_SQL}),
    mom AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(CAST(cents AS DECIMAL(18,0))
                        * CAST(cents AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS ss
        FROM arms GROUP BY arm
    ),
    mv AS (
        SELECT arm, n,
               CAST(s AS DOUBLE) / n AS m,
               (CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1) AS v
        FROM mom
    ),
    w AS (
        SELECT a.n AS n0, b.n AS n1, a.m AS m0, b.m AS m1,
               a.v / a.n + b.v / b.n AS se2,
               a.v / a.n AS se0, b.v / b.n AS se1
        FROM mv a JOIN mv b ON a.arm = 0 AND b.arm = 1
    )
    SELECT n0, n1,
           ROUND((m0 - m1) / CAST(100 AS DOUBLE) + 1e-9, 2) + 0.0
               AS mean_diff_dollars,
           ROUND((m0 - m1) / sqrt(se2) + 1e-9, 4) + 0.0 AS t_stat,
           ROUND((se2 * se2)
                 / (se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1))
                 + 1e-9, 2) + 0.0 AS welch_df
    FROM w
"""


@register("v27_welch_ttest", oracle=_WELCH_SQL)
def v27_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V27: Welch's unequal-variance t-test on per-user revenue — the
    workhorse continuous-metric readout (v16 tests proportions; v24 is
    the rank-based fallback; this is what actually runs on revenue,
    where arm variances differ by construction): t statistic plus the
    Welch-Satterthwaite degrees of freedom. Shares the single-sourced
    revenue frame (queries/exp_frames) with e20/v24/v25 so the
    population can never drift from its siblings.

    Cross-engine: n / Σx / Σx² are exact integers (cents), means and
    variances are identical double chains with every integer CAST
    explicit (Σx·Σx would overflow BIGINT at ~5e9 cents — cast BEFORE
    the square on both engines), so t and df agree to ulps before the
    4dp/2dp rounds. The second moment Σx² is accumulated as
    DECIMAL(38,0) on BOTH engines — a BIGINT sum of squares saturates
    at ~9.2e18, i.e. ~9e10 users at $10 apiece, inside 100 TB range;
    38 digits is unreachable and the decimal sum stays exact and
    shuffle-order-immune before the single cast to DOUBLE.

    Scale shape: one per-user aggregate, one 2-row moment census —
    every float op runs on two rows."""
    arms = user_revenue_arms(spark, sf_dir)
    mom = arms.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(
            F.col("cents").cast("decimal(18,0)")
            * F.col("cents").cast("decimal(18,0)")
        )
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    mv = mom.select(
        "arm",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("m"),
        (
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("v"),
    )
    a = mv.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("m").alias("m0"), F.col("v").alias("v0")
    )
    b = mv.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("m").alias("m1"), F.col("v").alias("v1")
    )
    w = a.crossJoin(F.broadcast(b)).select(  # bcast: fixed (1-row arm census)
        "n0",
        "n1",
        "m0",
        "m1",
        (F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")).alias("se2"),
        (F.col("v0") / F.col("n0")).alias("se0"),
        (F.col("v1") / F.col("n1")).alias("se1"),
    )
    return w.select(
        "n0",
        "n1",
        (
            F.round((F.col("m0") - F.col("m1")) / F.lit(100.0) + 1e-9, 2) + 0.0
        ).alias("mean_diff_dollars"),
        (
            F.round((F.col("m0") - F.col("m1")) / F.sqrt("se2") + 1e-9, 4) + 0.0
        ).alias("t_stat"),
        (
            F.round(
                (F.col("se2") * F.col("se2"))
                / (
                    F.col("se0") * F.col("se0") / (F.col("n0") - 1)
                    + F.col("se1") * F.col("se1") / (F.col("n1") - 1)
                )
                + 1e-9,
                2,
            )
            + 0.0
        ).alias("welch_df"),
    )


# --- v28: CUPED variance reduction (round 9) ----------------------------

_CUPED_SQL = """
    WITH per_user AS (
        SELECT user_id % 2 AS arm,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                              AND ts < TIMESTAMP '2024-01-16 00:00:00'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS pre,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                              AND ts >= TIMESTAMP '2024-01-16 00:00:00'
                        THEN CAST(ROUND(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS post
        FROM events GROUP BY user_id
    ),
    mom AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pre) AS BIGINT) AS sp,
               CAST(SUM(post) AS BIGINT) AS so,
               CAST(SUM(CAST(pre AS DECIMAL(18,0))
                        * CAST(pre AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS spp,
               CAST(SUM(CAST(post AS DECIMAL(18,0))
                        * CAST(post AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS soo,
               CAST(SUM(CAST(pre AS DECIMAL(18,0))
                        * CAST(post AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS spo
        FROM per_user GROUP BY arm
    ),
    pooled AS (
        SELECT CAST(SUM(n) AS DOUBLE) AS nn,
               CAST(SUM(sp) AS DOUBLE) AS tsp,
               CAST(SUM(so) AS DOUBLE) AS tso,
               CAST(SUM(spp) AS DOUBLE) AS tspp,
               CAST(SUM(spo) AS DOUBLE) AS tspo
        FROM mom
    ),
    th AS (
        SELECT nn,
               tsp / nn AS mu_pre,
               (tspo / nn - (tsp / nn) * (tso / nn))
                   / (tspp / nn - (tsp / nn) * (tsp / nn)) AS theta
        FROM pooled
    ),
    stats AS (
        SELECT m.arm, m.n,
               CAST(m.so AS DOUBLE) / m.n AS mean_post,
               CAST(m.sp AS DOUBLE) / m.n AS mean_pre,
               CAST(m.soo AS DOUBLE) / m.n
                   - (CAST(m.so AS DOUBLE) / m.n) * (CAST(m.so AS DOUBLE) / m.n)
                   AS var_post,
               CAST(m.spp AS DOUBLE) / m.n
                   - (CAST(m.sp AS DOUBLE) / m.n) * (CAST(m.sp AS DOUBLE) / m.n)
                   AS var_pre,
               CAST(m.spo AS DOUBLE) / m.n
                   - (CAST(m.sp AS DOUBLE) / m.n) * (CAST(m.so AS DOUBLE) / m.n)
                   AS cov_a,
               t.theta, t.mu_pre
        FROM mom m CROSS JOIN th t
    )
    SELECT CAST(arm AS BIGINT) AS arm, n,
           ROUND(mean_post / CAST(100 AS DOUBLE) + 1e-9, 4) + 0.0
               AS mean_post_dollars,
           ROUND((mean_post - theta * (mean_pre - mu_pre))
                 / CAST(100 AS DOUBLE) + 1e-9, 4) + 0.0 AS mean_adj_dollars,
           ROUND(theta + 1e-9, 6) + 0.0 AS theta,
           ROUND((CAST(1 AS DOUBLE)
                  - (var_post + theta * theta * var_pre
                     - CAST(2 AS DOUBLE) * theta * cov_a) / var_post)
                 * CAST(100 AS DOUBLE) + 1e-9, 2) + 0.0 AS var_reduction_pct
    FROM stats
"""


@register("v28_cuped_adjustment", oracle=_CUPED_SQL)
def v28_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V28: CUPED (Controlled-experiment Using Pre-Experiment Data,
    Deng et al. WSDM'13) — the variance-reduction workhorse every
    experimentation platform applies before the t-test: regress the
    post-period metric on the pre-period metric (theta = cov/var,
    POOLED across arms so the adjustment cannot bias the contrast),
    report per arm the raw and adjusted means and the achieved
    variance reduction. Completes the v-family readout chain: v16/v27
    test, v24 ranks, v26 corrects multiplicity, v12 bootstraps —
    this is the sensitivity multiplier applied before all of them.

    Cross-engine: per-user pre/post revenues are exact integer cents
    (first 15 days vs rest); all five moment sums are exact
    (DECIMAL(38,0) for the squares — the v27 overflow discipline);
    theta, adjusted means, and variances are mirrored double chains
    rounded at the edge.

    Scale shape: one per-user aggregate (map-side combined) collapses
    the fact to the user grain, one 2-row moment census per arm, and
    every float op runs on the 2-row frame with the 1-row pooled
    theta broadcast back (bounded-by-construction crossJoin)."""
    e = table(spark, sf_dir, "events")
    cut = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when((F.col("event_type") == "purchase") & (F.col("ts") < cut), cents)
            .otherwise(F.lit(0))
        )
        .cast("long")
        .alias("pre"),
        F.sum(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= cut), cents
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("post"),
    ).select((F.col("user_id") % 2).alias("arm"), "pre", "post")
    d18 = lambda c: F.col(c).cast("decimal(18,0)")
    mom = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pre").cast("long").alias("sp"),
        F.sum("post").cast("long").alias("so"),
        F.sum(d18("pre") * d18("pre")).cast("decimal(38,0)").alias("spp"),
        F.sum(d18("post") * d18("post")).cast("decimal(38,0)").alias("soo"),
        F.sum(d18("pre") * d18("post")).cast("decimal(38,0)").alias("spo"),
    )
    pooled = mom.agg(
        F.sum("n").cast("double").alias("nn"),
        F.sum("sp").cast("double").alias("tsp"),
        F.sum("so").cast("double").alias("tso"),
        F.sum("spp").cast("double").alias("tspp"),
        F.sum("spo").cast("double").alias("tspo"),
    )
    th = pooled.select(
        (F.col("tsp") / F.col("nn")).alias("mu_pre"),
        (
            (F.col("tspo") / F.col("nn")
             - (F.col("tsp") / F.col("nn")) * (F.col("tso") / F.col("nn")))
            / (F.col("tspp") / F.col("nn")
               - (F.col("tsp") / F.col("nn")) * (F.col("tsp") / F.col("nn")))
        ).alias("theta"),
    )
    mean_post = F.col("so").cast("double") / F.col("n")
    mean_pre = F.col("sp").cast("double") / F.col("n")
    stats = mom.crossJoin(F.broadcast(th)).select(  # bcast: fixed (1-row theta)
        "arm",
        "n",
        mean_post.alias("mean_post"),
        mean_pre.alias("mean_pre"),
        (F.col("soo").cast("double") / F.col("n") - mean_post * mean_post).alias(
            "var_post"
        ),
        (F.col("spp").cast("double") / F.col("n") - mean_pre * mean_pre).alias(
            "var_pre"
        ),
        (F.col("spo").cast("double") / F.col("n") - mean_pre * mean_post).alias(
            "cov_a"
        ),
        "theta",
        "mu_pre",
    )
    return stats.select(
        F.col("arm").cast("long").alias("arm"),
        "n",
        (F.round(F.col("mean_post") / F.lit(100.0) + 1e-9, 4) + 0.0).alias(
            "mean_post_dollars"
        ),
        (
            F.round(
                (F.col("mean_post")
                 - F.col("theta") * (F.col("mean_pre") - F.col("mu_pre")))
                / F.lit(100.0)
                + 1e-9,
                4,
            )
            + 0.0
        ).alias("mean_adj_dollars"),
        (F.round(F.col("theta") + 1e-9, 6) + 0.0).alias("theta"),
        (
            F.round(
                (
                    F.lit(1.0)
                    - (
                        F.col("var_post")
                        + F.col("theta") * F.col("theta") * F.col("var_pre")
                        - F.lit(2.0) * F.col("theta") * F.col("cov_a")
                    )
                    / F.col("var_post")
                )
                * F.lit(100.0)
                + 1e-9,
                2,
            )
            + 0.0
        ).alias("var_reduction_pct"),
    )


# --- v29: sample-size / power analysis (round 9) -------------------------

_POWER_SQL = f"""
    WITH arms AS ({{REV}}),
    mom AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(CAST(cents AS DECIMAL(18,0))
                        * CAST(cents AS DECIMAL(18,0)))
                    AS DECIMAL(38,0)) AS ss
        FROM arms GROUP BY arm
    ),
    pooled AS (
        SELECT CAST(SUM(n) AS DOUBLE) AS nn,
               CAST(SUM(s) AS DOUBLE) AS ts,
               CAST(SUM(ss) AS DOUBLE) AS tss,
               CAST(MAX(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
               CAST(MAX(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
               MAX(CASE WHEN arm = 0 THEN CAST(s AS DOUBLE) / n END) AS m0
        FROM mom
    ),
    calc AS (
        SELECT n0, n1, m0,
               tss / nn - (ts / nn) * (ts / nn) AS var_pooled,
               CAST(0.05 AS DOUBLE) * m0 AS mde_cents
        FROM pooled
    )
    SELECT n0, n1,
           ROUND(sqrt(var_pooled) / CAST(100 AS DOUBLE) + 1e-9, 4) + 0.0
               AS pooled_sd_dollars,
           ROUND(mde_cents / CAST(100 AS DOUBLE) + 1e-9, 4) + 0.0
               AS mde_dollars,
           CAST(CEIL(CAST(2 AS DOUBLE)
                     * (CAST(1.959963985 AS DOUBLE)
                        + CAST(0.8416212336 AS DOUBLE))
                     * (CAST(1.959963985 AS DOUBLE)
                        + CAST(0.8416212336 AS DOUBLE))
                     * var_pooled / (mde_cents * mde_cents)) AS BIGINT)
               AS n_required_per_arm
    FROM calc
"""


@register(
    "v29_power_analysis",
    oracle=_POWER_SQL.format(REV=REV_ARMS_SQL),
)
def v29_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V29: the sample-size calculator every experiment review starts
    with — given the observed per-user revenue variance (pooled
    across arms) and a 5%-of-control-mean minimum detectable effect,
    how many users per arm does a two-sided α=0.05, 80%-power t-test
    need? n = 2(z_{{α/2}}+z_β)²σ²/Δ². Closes the v-family loop: v29
    sizes the experiment, v28 shrinks σ², v16/v27 read it out, v26
    corrects the family, v19 checks the randomizer (SRM).

    Cross-engine: moments exact (the v27 DECIMAL(38,0) discipline,
    shared REV_ARMS frame so the population can never drift from
    v24/v25/v27/e20); z-constants are identical literals; CEIL of
    the identical double chain lands on the same integer (a boundary
    collision would need the chain to produce an exact integer —
    measure-zero and fixture-pinned).

    Scale shape: one per-user aggregate, one 2-row census, all float
    work on one row."""
    arms = user_revenue_arms(spark, sf_dir)
    d18 = lambda c: F.col(c).cast("decimal(18,0)")
    mom = arms.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(d18("cents") * d18("cents")).cast("decimal(38,0)").alias("ss"),
    )
    pooled = mom.agg(
        F.sum("n").cast("double").alias("nn"),
        F.sum("s").cast("double").alias("ts"),
        F.sum("ss").cast("double").alias("tss"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).cast("long").alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).cast("long").alias("n1"),
        F.max(
            F.when(F.col("arm") == 0, F.col("s").cast("double") / F.col("n"))
        ).alias("m0"),
    )
    calc = pooled.select(
        "n0",
        "n1",
        "m0",
        (
            F.col("tss") / F.col("nn")
            - (F.col("ts") / F.col("nn")) * (F.col("ts") / F.col("nn"))
        ).alias("var_pooled"),
        (F.lit(0.05) * F.col("m0")).alias("mde_cents"),
    )
    z = F.lit(1.959963985) + F.lit(0.8416212336)
    return calc.select(
        "n0",
        "n1",
        (
            F.round(F.sqrt("var_pooled") / F.lit(100.0) + 1e-9, 4) + 0.0
        ).alias("pooled_sd_dollars"),
        (F.round(F.col("mde_cents") / F.lit(100.0) + 1e-9, 4) + 0.0).alias(
            "mde_dollars"
        ),
        F.ceil(
            F.lit(2.0) * z * z * F.col("var_pooled")
            / (F.col("mde_cents") * F.col("mde_cents"))
        )
        .cast("long")
        .alias("n_required_per_arm"),
    )
