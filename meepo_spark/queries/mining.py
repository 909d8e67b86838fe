"""Graded data-mining queries: market-basket association pairs,
per-user event-transition (Markov) matrices, RFM customer
segmentation, and a count-min sketch built from first principles.

These are the everyday "mining on a fact table" shapes a warehouse
engine gets asked for beyond plain rollups. Cross-engine discipline
follows the registry conventions: exact integers wherever possible,
`+ 1e-9` nudge + ROUND on the few reported ratios, compound
(key, tiebreak) orderings so both engines rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.registry import register
from meepo_spark.operators.broadcast_gate import maybe_broadcast
from meepo_spark.queries._session_cache import SessionFrameCache

# --- session-scoped basket frames (optimization r10) --------------------
# m1 (support/lift), m5 (confidence/conviction), and m8 (cosine top-k)
# each re-ran the identical basket build (one fact shuffle) and pair
# expansion + count (the mining pass's dominant stage) per query. One
# cached basket frame and ONE cached directed pair-count frame now
# serve all three — m1's undirected support is the ant < con half of
# the directed counts, m5's n_both and m8's co ARE the directed counts
# — so the corpus is mined once per (app, sf_dir), the doc_cache /
# sparse_tf discipline.

_BASKETS_CACHE = SessionFrameCache(max_per_app=3)
_PAIRS_CACHE = SessionFrameCache(max_per_app=3)


def _build_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )


def order_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, parts): each order's deduped sorted part basket —
    ONE keyed fact aggregation, the only corpus-sized shuffle of the
    whole market-basket family."""
    return _BASKETS_CACHE.get(spark, sf_dir, _build_baskets)


def _build_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    baskets = order_baskets(spark, sf_dir)
    # all ordered pairs (x, y), x != y, expanded MAP-SIDE from the
    # basket arrays (quadratic in basket size <=13, never table size)
    pair_structs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x: F.transform(
                F.filter(F.col("parts"), lambda y: x != y),
                lambda y: F.struct(x.alias("ant"), y.alias("con")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.ant").alias("ant"), F.col("p.con").alias("con"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )


def part_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ant, con, n_both): DIRECTED co-occurrence counts over order
    baskets, both orientations present with equal counts. Undirected
    support = the ant < con half."""
    return _PAIRS_CACHE.get(spark, sf_dir, _build_pair_counts)


@register(
    "m1_basket_pairs",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    totals AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
               FROM items GROUP BY 1),
    n_ord AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
              FROM items),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM items a
        JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.support,
           ROUND(CAST(p.support AS DOUBLE) * n.n
                 / (ta.n_item * tb.n_item) + 1e-9, 3) AS lift
    FROM pairs p
    CROSS JOIN n_ord n
    JOIN totals ta ON ta.l_partkey = p.part_a
    JOIN totals tb ON tb.l_partkey = p.part_b
    """,
)
def m1_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: market-basket frequent pairs with lift — which parts
    co-occur in the same order more often than chance. The classic
    association-rule support/lift computation, the first step of any
    co-purchase / co-occurrence recommender.

    Scale shape: NO self-join and ONE fact shuffle. collect_set
    builds each order's (deduped, sorted) basket in a single keyed
    aggregation; pairs are expanded MAP-SIDE from the arrays — work
    and output quadratic only in basket size (≤13 here; bounded in
    any retail schema), never in table size — and pair counts
    partial-aggregate before their own shuffle. The basket frame AND
    the directed pair-count frame are session-cached (optimization
    r10) and shared with m5/m8 — m1's undirected support is the
    ant < con half of the directed counts, so the whole family mines
    the corpus once. A self-join formulation would
    shuffle the fact table once per side and re-dedup each. Lift
    arithmetic joins only broadcast scalars/dims (exact integers;
    lift is the single rounded float)."""
    baskets = order_baskets(spark, sf_dir)
    pairs = (
        part_pair_counts(spark, sf_dir)
        .filter(F.col("ant") < F.col("con"))
        .select(
            F.col("ant").alias("part_a"),
            F.col("con").alias("part_b"),
            F.col("n_both").alias("support"),
        )
        .filter(F.col("support") >= 2)
    )
    totals = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    n_ord = baskets.agg(F.count(F.lit(1)).alias("n"))
    ta = totals.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("na")
    )
    tb = totals.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("nb")
    )
    return (
        pairs.crossJoin(F.broadcast(n_ord))  # bcast: fixed (1-row total)
        .join(maybe_broadcast(ta), "part_a")
        .join(maybe_broadcast(tb), "part_b")
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(
                F.col("support").cast("double")
                * F.col("n")
                / (F.col("na") * F.col("nb"))
                + 1e-9,
                3,
            ).alias("lift"),
        )
    )


@register(
    "m2_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY prev_type)
                 + 1e-9, 4) AS p
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def m2_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: first-order Markov transition matrix over the event stream
    — for each user-adjacent (previous type → next type) pair, the
    count and the row-normalized transition probability. The
    session-path / clickstream-analysis primitive (what do users do
    after an error?).

    Scale shape: ONE shuffle on user_id for the LAG (event order is
    per-user, so the window is properly partitioned — no global
    sort), then a 25-cell aggregate; the probability normalization
    window runs on the 25-row result. Ordering ties break on
    event_id at µs precision so both engines sequence identically."""
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(
            W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
        )
        .alias("prev_type"),
    )
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("prev_type"))
            + 1e-9,
            4,
        ).alias("p"),
    )


@register(
    "m3_rfm_segments",
    oracle="""
    WITH cm AS (
        SELECT o_custkey,
               MAX(CAST(o_orderdate AS DATE)) AS last_day,
               CAST(COUNT(*) AS BIGINT) AS freq,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary
        FROM orders GROUP BY 1
    ),
    scored AS (
        SELECT o_custkey, monetary,
               NTILE(4) OVER (ORDER BY last_day DESC, o_custkey) AS r,
               NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f,
               NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
        FROM cm
    )
    SELECT r, f, m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(monetary) AS DOUBLE) / COUNT(*) + 1e-9, 2)
               AS avg_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
)
def m3_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: RFM segmentation — quartile scores for Recency (latest
    order date), Frequency (order count), and Monetary (lifetime
    spend), reported as segment sizes and average spend. The standard
    CRM / marketing-audience cut of a customer base.

    Scale shape (r3, per VERDICT r2 #3): the fact scan reduces to ONE
    row per customer, then each NTILE becomes an o7 bucketed global
    rank — equal-width buckets over a numeric key monotone with the
    sort order, per-bucket counts -> broadcast running offsets ->
    per-bucket row_number + offset — and NTILE(4) is recovered as a
    pure function of (global rank, N): the first N%4 tiles take
    ceil(N/4) rows, the rest floor(N/4). No unpartitioned window ever
    sees |customers| rows; the only global structures are the 32-entry
    offset vectors and the 1-row (lo, hi, N) aggregate. Ties break on
    custkey so both engines cut identical quartile boundaries.
    Monetary sums stay DECIMAL until the final rounded ratio."""
    cm = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias(
                "monetary"
            ),
        )
        # optimization r11: each bucketed_ntile branch references cm
        # three times (range agg, bucket assign, bucket counts) and the
        # final join once more — the before-plan re-ran the orders
        # scan+aggregate 26 TIMES (AQE exchange reuse does not fire
        # across the differently-projected subtrees). Materialize the
        # customer-grain aggregate ONCE; at 100 TB it is a standard
        # |customers|-row intermediate (the l68c pruned-index class),
        # and the fact is scanned exactly once.
        .localCheckpoint()
    )

    from meepo_spark.operators.enumeration import bucketed_ntile

    # Three INDEPENDENT quartile branches joined back on custkey —
    # chaining the ntiles instead makes each one's count/range
    # branches recompute all previous enumeration machinery (the
    # chained plan referenced the orders scan 67 times). Each branch
    # sees the identical unpruned cm subplan, so AQE reuses one
    # customer-aggregate exchange across all three.
    def tile(key_asc, order_cols, out):
        return bucketed_ntile(cm, key_asc, order_cols, 4, out=out).select(
            "o_custkey", out
        )

    r = tile(
        -F.datediff("last_day", F.lit("1970-01-01")),
        [F.col("last_day").desc(), F.col("o_custkey")], "r4",
    )
    f = tile(-F.col("freq"), [F.col("freq").desc(), F.col("o_custkey")], "f4")
    m = tile(
        -F.col("monetary"), [F.col("monetary").desc(), F.col("o_custkey")], "m4"
    )
    scored = (
        cm.select("o_custkey", "monetary")
        .join(r, "o_custkey")
        .join(f, "o_custkey")
        .join(m, "o_custkey")
        .select(
            "monetary",
            F.col("r4").cast("int").alias("r"),
            F.col("f4").cast("int").alias("f"),
            F.col("m4").cast("int").alias("m"),
        )
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.sum("monetary").cast("double") / F.count(F.lit(1)) + 1e-9, 2
        ).alias("avg_monetary"),
    )


_HEX = "0123456789abcdef"
# DuckDB-side hex→int for one md5 nibble (1-based position p of h)
_NIB = f"(instr('{_HEX}', substr(h, {{p}}, 1)) - 1)"


def _duck_bucket(i: int, width: int) -> str:
    """3-nibble md5 slice [3i+1 .. 3i+3] → bucket in [0, width)."""
    p = 3 * i + 1
    return (
        f"(({_NIB.format(p=p)} * 256 + {_NIB.format(p=p + 1)} * 16 + "
        f"{_NIB.format(p=p + 2)}) % {width})"
    )


@register(
    "g9_count_min_sketch",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    freq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS true_n
        FROM tok GROUP BY 1
    ),
    hashed AS (
        SELECT token, true_n,
               {_duck_bucket(0, 16)} AS b0,
               {_duck_bucket(1, 16)} AS b1,
               {_duck_bucket(2, 16)} AS b2
        FROM (SELECT token, true_n, md5(token) AS h FROM freq)
    ),
    sketch AS (
        SELECT depth, bucket, CAST(SUM(true_n) AS BIGINT) AS cnt
        FROM (
            SELECT 0 AS depth, b0 AS bucket, true_n FROM hashed
            UNION ALL SELECT 1, b1, true_n FROM hashed
            UNION ALL SELECT 2, b2, true_n FROM hashed
        )
        GROUP BY 1, 2
    ),
    top5 AS (
        SELECT * FROM hashed ORDER BY true_n DESC, token LIMIT 5
    ),
    probes AS (
        SELECT token, true_n, 0 AS depth, b0 AS bucket FROM top5
        UNION ALL SELECT token, true_n, 1, b1 FROM top5
        UNION ALL SELECT token, true_n, 2, b2 FROM top5
    )
    SELECT p.token, p.true_n,
           CAST(MIN(s.cnt) AS BIGINT) AS cms_est,
           CAST(MIN(s.cnt) - p.true_n AS BIGINT) AS overcount
    FROM probes p
    JOIN sketch s ON s.depth = p.depth AND s.bucket = p.bucket
    GROUP BY p.token, p.true_n
    """,
)
def g9_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9: count-min sketch from first principles — depth 3 × width
    16 counters keyed by independent md5-slice hashes, probed for the
    5 most frequent tokens. Output proves the CMS contract: estimate
    = min over rows ≥ true count, with the overcount made explicit
    (width 16 on a 31-token vocabulary forces real collisions).

    Why it matters at 100 TB: the sketch is a FIXED 48-counter state
    regardless of stream size, built with a perfectly map-side-
    combinable SUM per (depth, bucket) — the frequency oracle you can
    afford on an unbounded stream, and mergeable across shards by
    counter addition (same argument as the HLL union in g3b). The
    hash here is arithmetic on md5 nibbles purely so DuckDB can
    replicate it; production would use xxhash64(token, seed_i)."""
    depth, width = 3, 16
    from meepo_spark.queries.doc_cache import tokenized_docs

    tok = tokenized_docs(spark, sf_dir).select(
        F.explode(F.col("toks")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("true_n"))
    h = F.md5("token")
    buckets = [
        (F.conv(F.substring(h, 3 * i + 1, 3), 16, 10).cast("long") % width)
        for i in range(depth)
    ]
    hashed = freq.select(
        "token", "true_n", *[b.alias(f"b{i}") for i, b in enumerate(buckets)]
    )
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("depth"), F.col(f"b{i}").alias("bucket")
                )
                for i in range(depth)
            ]
        )
    )
    sketch = (
        hashed.select(cells.alias("db"), "true_n")
        .groupBy(F.col("db.depth").alias("depth"), F.col("db.bucket").alias("bucket"))
        .agg(F.sum("true_n").alias("cnt"))
    )
    top5 = hashed.orderBy(F.col("true_n").desc(), "token").limit(5)
    probes = top5.select("token", "true_n", cells.alias("db")).select(
        "token", "true_n", "db.depth", "db.bucket"
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"])  # bcast: fixed (depth x bucket sketch)
        .groupBy("token", "true_n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "token",
            "true_n",
            "cms_est",
            (F.col("cms_est") - F.col("true_n")).alias("overcount"),
        )
    )


@register(
    "m4_sequence_patterns",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS nxt1,
               LEAD(event_type, 2) OVER w AS nxt2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT event_type || '>' || nxt1 || '>' || nxt2 AS pattern,
           COUNT(*)                                  AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)   AS n_users
    FROM ordered
    WHERE nxt1 IS NOT NULL AND nxt2 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, pattern ASC
    LIMIT 15
    """,
)
def m4_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: frequent behavioral trigrams — each user's event stream in
    (ts, event_id) order yields overlapping 3-step patterns via two
    leads over one window; global support counts rank the top 15
    (total order: count desc, pattern asc).

    Scale shape: one shuffle keyed by user_id for the window (user
    partitions are independent — perfectly spreadable), then the
    pattern-vocabulary aggregation is map-side partial over at most
    |event_type|^3 groups. The window-lead formulation is the
    sequence-mining shape that avoids self-joining the event log per
    step (which would be O(n * depth) shuffles)."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ordered = e.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    ).filter(F.col("nxt1").isNotNull() & F.col("nxt2").isNotNull())
    return (
        ordered.select(
            F.concat_ws(">", "event_type", "nxt1", "nxt2").alias("pattern"), "user_id"
        )
        .groupBy("pattern")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("pattern").asc())
        .limit(15)
    )


@register(
    "m5_association_rules",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    totals AS (SELECT l_partkey, COUNT(*) AS n_item FROM items GROUP BY 1),
    n_ord AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
    pairs AS (
        SELECT a.l_partkey AS ant, b.l_partkey AS con, COUNT(*) AS n_both
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    rules AS (
        SELECT p.ant, p.con,
               CAST(p.n_both AS BIGINT)                    AS n_both,
               ROUND(p.n_both * 1.0 / ta.n_item + 1e-9, 4) AS confidence,
               ROUND((1.0 - tc.n_item * 1.0 / o.n)
                     / (1.0 - p.n_both * 1.0 / ta.n_item) + 1e-9, 4) AS conviction
        FROM pairs p
        JOIN totals ta ON p.ant = ta.l_partkey
        JOIN totals tc ON p.con = tc.l_partkey
        CROSS JOIN n_ord o
        WHERE p.n_both >= 2
          AND 10 * p.n_both >= ta.n_item  -- conf >= 0.1, integer-exact
          AND p.n_both < ta.n_item        -- conf < 1 so conviction is finite
    )
    SELECT * FROM rules
    ORDER BY confidence DESC, ant ASC, con ASC
    LIMIT 25
    """,
)
def m5_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: directed association rules A→B with confidence P(B|A) and
    conviction (1−P(B))/(1−conf) — the measures m1's symmetric
    support+lift can't give (direction matters: bread→butter and
    butter→bread share lift but not confidence). The confidence
    threshold is the INTEGER predicate 10·n_both ≥ n_item, so the cut
    can never straddle a float boundary between engines; conf = 1
    rules are excluded to keep conviction finite; top-25 under a
    total order.

    Scale shape (optimization r10): identical anatomy to m1 — and now
    literally the same frames: the session-cached basket frame and
    directed pair-count frame (`order_baskets`/`part_pair_counts`)
    replace the per-query self-join, so the family's one fact shuffle
    and one pair expansion serve m1/m5/m8 together; item totals and
    the basket count are tiny aggregates over the cached baskets; the
    rule measures are arithmetic on the same aggregates."""
    baskets = order_baskets(spark, sf_dir)
    totals = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    n_ord = baskets.agg(F.count(F.lit(1)).alias("n"))
    pairs = part_pair_counts(spark, sf_dir)
    conf = F.col("n_both") * 1.0 / F.col("na")
    pb = F.col("nc") * 1.0 / F.col("n")
    return (
        pairs.join(maybe_broadcast(totals.select(F.col("l_partkey").alias("ant"), F.col("n_item").alias("na"))), "ant")
        .join(maybe_broadcast(totals.select(F.col("l_partkey").alias("con"), F.col("n_item").alias("nc"))), "con")
        .crossJoin(F.broadcast(n_ord))  # bcast: fixed (1-row total)
        .filter(
            (F.col("n_both") >= 2)
            & (10 * F.col("n_both") >= F.col("na"))
            & (F.col("n_both") < F.col("na"))
        )
        .select(
            "ant", "con", "n_both",
            F.round(conf + F.lit(1e-9), 4).alias("confidence"),
            F.round((1.0 - pb) / (1.0 - conf) + F.lit(1e-9), 4).alias("conviction"),
        )
        .orderBy(F.col("confidence").desc(), F.col("ant").asc(), F.col("con").asc())
        .limit(25)
    )


@register(
    "m6_markov_stationary",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    c AS (
        SELECT event_type AS i, nxt AS j, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    states AS (SELECT DISTINCT event_type AS s FROM events),
    grid AS (SELECT a.s AS i, b.s AS j FROM states a CROSS JOIN states b),
    rowtot AS (SELECT i, SUM(n) AS tot FROM c GROUP BY i),
    p AS (
        SELECT g.i, g.j,
               (COALESCE(c.n, 0) + 1.0)
               / (COALESCE(r.tot, 0) + (SELECT COUNT(*) FROM states)) AS p
        FROM grid g
        LEFT JOIN c ON g.i = c.i AND g.j = c.j
        LEFT JOIN rowtot r ON g.i = r.i
    ),
    pi0 AS (SELECT s, 1.0 / (SELECT COUNT(*) FROM states) AS v FROM states),
    pi1 AS (SELECT p.j AS s, SUM(pi0.v * p.p) AS v FROM pi0 JOIN p ON pi0.s = p.i GROUP BY p.j),
    pi2 AS (SELECT p.j AS s, SUM(pi1.v * p.p) AS v FROM pi1 JOIN p ON pi1.s = p.i GROUP BY p.j),
    pi3 AS (SELECT p.j AS s, SUM(pi2.v * p.p) AS v FROM pi2 JOIN p ON pi2.s = p.i GROUP BY p.j),
    pi4 AS (SELECT p.j AS s, SUM(pi3.v * p.p) AS v FROM pi3 JOIN p ON pi3.s = p.i GROUP BY p.j),
    pi5 AS (SELECT p.j AS s, SUM(pi4.v * p.p) AS v FROM pi4 JOIN p ON pi4.s = p.i GROUP BY p.j),
    pi6 AS (SELECT p.j AS s, SUM(pi5.v * p.p) AS v FROM pi5 JOIN p ON pi5.s = p.i GROUP BY p.j),
    pi7 AS (SELECT p.j AS s, SUM(pi6.v * p.p) AS v FROM pi6 JOIN p ON pi6.s = p.i GROUP BY p.j),
    pi8 AS (SELECT p.j AS s, SUM(pi7.v * p.p) AS v FROM pi7 JOIN p ON pi7.s = p.i GROUP BY p.j)
    SELECT s AS state, ROUND(v + 1e-9, 6) AS pi_r
    FROM pi8
    """,
)
def m6_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: stationary distribution of the user-journey Markov chain —
    m2 builds the transition matrix; this answers 'where do journeys
    spend their time in the long run'. Laplace-smoothed transition
    probabilities p(i→j) = (c_ij + 1)/(c_i + |S|) (smoothing makes
    the chain ergodic, so the power iteration converges regardless of
    absorbing patterns in the raw counts), then 8 fixed power
    iterations from the uniform vector — the fixed budget is what
    makes the iteration SQL-unrollable for the oracle (the l3g Lloyd
    recipe).

    Scale shape (optimization r10): ONE windowed pass over the fact
    builds the consecutive-pair counts (partitioned by user_id — a
    real key); the |S|² = 25-entry count matrix and |S|-row state set
    are SF-independent bounded state, collected once, and the 8 power
    iterations are exact driver arithmetic (the g10/quantiles
    posture — previously 8 joins + aggregates of tiny frames, ~16
    scheduled jobs of latency). Summation-order noise (~1e-16) is
    absorbed by the +1e-9 6dp rounding exactly as it already was
    between Spark's and DuckDB's differing fold orders."""
    from meepo_spark.operators.trade_graph import bounded_rows, round_half_up

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("i"), F.col("nxt").alias("j")
    ).agg(F.count(F.lit(1)).alias("n"))
    counts = {
        (r["i"], r["j"]): int(r["n"])
        for r in bounded_rows(c, 10_000, "event-type transition matrix")
    }
    states = sorted(
        r["s"]
        for r in bounded_rows(
            table(spark, sf_dir, "events")
            .select(F.col("event_type").alias("s"))
            .distinct(),
            100,
            "event-type states",
        )
    )
    k = len(states)
    tot: dict[str, int] = {}
    for (i, _j), n in counts.items():
        tot[i] = tot.get(i, 0) + n
    p = {
        (i, j): (counts.get((i, j), 0) + 1.0) / (tot.get(i, 0) + k)
        for i in states
        for j in states
    }
    pi = {s: 1.0 / k for s in states}
    for _ in range(8):
        pi = {
            j: sum(pi[i] * p[(i, j)] for i in states) for j in states
        }
    rows = [(s, round_half_up(pi[s] + 1e-9, 6)) for s in states]
    return spark.createDataFrame(rows, "state string, pi_r double")


@register(
    "m7_frequent_triples",
    oracle="""
    WITH items AS (SELECT DISTINCT user_id, event_type FROM events),
    nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM items),
    triples AS (
        SELECT a.event_type AS t_a, b.event_type AS t_b, c.event_type AS t_c,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM items a
        JOIN items b ON a.user_id = b.user_id AND a.event_type < b.event_type
        JOIN items c ON a.user_id = c.user_id AND b.event_type < c.event_type
        GROUP BY 1, 2, 3
    )
    SELECT t_a, t_b, t_c, support,
           ROUND(support * 1.0 / nu.n + 1e-9, 4) AS support_ratio
    FROM triples CROSS JOIN nu
    WHERE support * 10 >= nu.n
    """,
)
def m7_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7: frequent 3-itemsets over behavior baskets (user → distinct
    event types) at 10% relative support — the level-3 Apriori pass on
    top of m1's pairs. The ENGINE plan is the level-wise algorithm:
    candidate triples extend FREQUENT pairs only, then two semi-joins
    prune candidates whose (b,c)/(a,c) sub-pairs are infrequent before
    the expensive support count — the downward-closure property
    guarantees this loses nothing, which is exactly what the oracle's
    unpruned brute-force triple join verifies by hash match.

    Scale shape: the frequent-pair frame is item²-bounded (event-type
    vocabulary, not users) and broadcast into both the extension join
    and the prune semi-joins; the only user-sized shuffles are the
    distinct-items pass and the final support count, whose input the
    pruning already cut. Support threshold compares as integers
    (support·10 ≥ n_users) — no float ratio near the cut."""
    ev = table(spark, sf_dir, "events")
    items = ev.select("user_id", "event_type").distinct()
    nu = items.agg(
        F.countDistinct("user_id").cast("long").alias("n")
    )
    pair_support = (
        items.alias("a")
        .join(
            items.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("p_a"),
            F.col("b.event_type").alias("p_b"),
        )
        .agg(F.count(F.lit(1)).alias("ps"))
    )
    fp = (
        pair_support.crossJoin(F.broadcast(nu))  # bcast: fixed (1-row user count)
        .filter(F.col("ps") * 10 >= F.col("n"))
        .select("p_a", "p_b")
    )
    # extend frequent pairs by a third item from the same basket...
    cand = (
        items.alias("a")
        .join(
            F.broadcast(fp).alias("f"),  # bcast: fixed (item-vocabulary sized)
            F.col("a.event_type") == F.col("f.p_a"),
        )
        .join(
            items.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.event_type") == F.col("f.p_b")),
        )
        .join(
            items.alias("c"),
            (F.col("a.user_id") == F.col("c.user_id"))
            & (F.col("f.p_b") < F.col("c.event_type")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("f.p_a").alias("t_a"),
            F.col("f.p_b").alias("t_b"),
            F.col("c.event_type").alias("t_c"),
        )
    )
    # ...and prune candidates whose other two sub-pairs are infrequent
    # BEFORE the support count (downward closure: lossless)
    pruned = cand.join(
        F.broadcast(fp),  # bcast: fixed (item-vocabulary sized)
        (F.col("t_b") == F.col("p_a")) & (F.col("t_c") == F.col("p_b")),
        "left_semi",
    ).join(
        F.broadcast(fp),  # bcast: fixed (item-vocabulary sized)
        (F.col("t_a") == F.col("p_a")) & (F.col("t_c") == F.col("p_b")),
        "left_semi",
    )
    return (
        pruned.groupBy("t_a", "t_b", "t_c")
        .agg(F.count(F.lit(1)).alias("support"))
        .crossJoin(F.broadcast(nu))  # bcast: fixed (1-row user count)
        .filter(F.col("support") * 10 >= F.col("n"))
        .select(
            "t_a",
            "t_b",
            "t_c",
            "support",
            F.round(F.col("support") * 1.0 / F.col("n") + 1e-9, 4).alias(
                "support_ratio"
            ),
        )
    )


@register(
    "m8_item_item_cosine",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    deg AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM items
            GROUP BY 1),
    co AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS co
        FROM items a
        JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, co,
           ROUND(cos_sim + 1e-9, 6) AS cosine_r,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT c.part_a, c.part_b, c.co,
               c.co / sqrt(da.n * db.n) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY c.part_a
                   ORDER BY c.co / sqrt(da.n * db.n) DESC, c.part_b) AS rank
        FROM co c
        JOIN deg da ON da.l_partkey = c.part_a
        JOIN deg db ON db.l_partkey = c.part_b
    )
    WHERE rank <= 3
    """,
)
def m8_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8: item-item collaborative filtering — cosine similarity over
    binary basket vectors (co(a,b)/√(n_a·n_b)), top-3 neighbors per
    part with co-occurrence >= 2. The classic neighborhood recommender
    ('customers who bought X also bought'), completing the mining
    family's arc from m1's lift (independence test) to an actual
    ranked neighbor list.

    Determinism without rounding-before-rank: cosine here is ONE
    correctly-rounded IEEE op chain over exact integers
    (int÷sqrt(int·int)) — no float summation anywhere — so both
    engines compute bit-identical scores and the (cosine DESC,
    part_b) rank is stable cross-engine; only the DISPLAY value
    rounds. Scale shape (optimization r10): co-occurrence reads the
    session-cached directed pair-count frame shared with m1/m5 (pair
    volume bounded by Σ k_i², k_i = basket width — flat at any corpus
    size for bounded baskets; the self-equi-join this replaces
    shuffled the fact once per side), degree frame joined twice, and
    the top-3 is a rank-limited window (WindowGroupLimit: map-side
    top-k per part, the sort never sees the full pair set)."""
    deg = (
        order_baskets(spark, sf_dir)
        .select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    co = (
        part_pair_counts(spark, sf_dir)
        .select(
            F.col("ant").alias("part_a"),
            F.col("con").alias("part_b"),
            F.col("n_both").alias("co"),
        )
        .filter(F.col("co") >= 2)
    )
    scored = (
        co.join(
            deg.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na")),
            "part_a",
        )
        .join(
            deg.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb")),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "co",
            (F.col("co") / F.sqrt(F.col("na") * F.col("nb"))).alias("cos_sim"),
        )
    )
    w = W.partitionBy("part_a").orderBy(F.col("cos_sim").desc(), F.col("part_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "part_a",
            "part_b",
            "co",
            F.round(F.col("cos_sim") + 1e-9, 6).alias("cosine_r"),
            "rank",
        )
    )


@register(
    "m9_sequential_rules",
    oracle="""
    WITH f AS (
        SELECT user_id, event_type, MIN(ts) AS fts
        FROM events GROUP BY 1, 2
    ),
    ab AS (
        SELECT a.event_type AS antecedent, b.event_type AS consequent,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM f a JOIN f b
          ON a.user_id = b.user_id AND a.event_type <> b.event_type
        WHERE b.fts > a.fts AND b.fts <= a.fts + INTERVAL 7 DAY
        GROUP BY 1, 2
    ),
    na AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_a
           FROM f GROUP BY 1)
    SELECT ab.antecedent, ab.consequent, na.n_a, ab.n_ab,
           ROUND(CAST(ab.n_ab AS DOUBLE) / na.n_a + 1e-9, 4) + 0.0
               AS confidence
    FROM ab JOIN na ON na.event_type = ab.antecedent
    """,
)
def m9_sequential_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9: time-bounded SEQUENTIAL association rules — for each
    ordered event-type pair (A -> B), the share of users whose first B
    follows their first A within 7 days. The temporal complement of
    m5's co-occurrence rules (order- and window-blind) and m2's
    one-step transitions (adjacent events only): this is the
    "does signup lead to purchase within a week" shape growth teams
    actually ask, on the first-touch grain that makes the rule
    well-defined per user.

    Scale shape: the event log collapses to the (user, type,
    first_ts) frame in one map-side-combined aggregate — bounded by
    users x |types|, NOT events — and the sequential join runs inside
    each user's <= |types| rows (a self-equi-join on user_id, never a
    fact self-join). Counts are exact integers; confidence is one
    division rounded at 4dp; the 7-day window is exact timestamp
    arithmetic on both engines (compared, never rendered)."""
    ev = table(spark, sf_dir, "events")
    f = ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("fts"))
    a = f.select(
        "user_id", F.col("event_type").alias("antecedent"), F.col("fts").alias("ta")
    )
    b = f.select(
        "user_id", F.col("event_type").alias("consequent"), F.col("fts").alias("tb")
    )
    ab = (
        a.join(b, "user_id")
        .filter(
            (F.col("antecedent") != F.col("consequent"))
            & (F.col("tb") > F.col("ta"))
            & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    na = f.groupBy(F.col("event_type").alias("antecedent")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    return (
        ab.join(F.broadcast(na), "antecedent")  # bcast: fixed (|types| rows)
        .select(
            "antecedent",
            "consequent",
            "n_a",
            "n_ab",
            (
                F.round(F.col("n_ab").cast("double") / F.col("n_a") + 1e-9, 4)
                + 0.0
            ).alias("confidence"),
        )
    )
