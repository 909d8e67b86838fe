"""UDF-surface queries (SURVEY.md §2.B U1/U3/U4): Arrow-vectorized
scalar pandas UDF, grouped-agg pandas UDAF, Python UDTF.

These are deliberately the ONLY graded queries with Python in the hot
path — everything else stays JVM-side (the §4.4 discipline). They
exist to prove the engine's extension surface: when a kernel genuinely
can't be expressed in built-ins, this is the sanctioned shape — Arrow
batches in, Arrow batches out, never row-at-a-time ``udf()``.
U2 (grouped-map ``applyInPandas``) is exercised by the multimodal
queries and the stateful streaming tests.

UDFs are built lazily inside each query: ``pandas_udf``/``udtf``
decorators parse their DDL return type against the ACTIVE session, so
module-import-time construction would require a SparkSession before
the registry can load.
"""

from __future__ import annotations

from functools import cache
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.registry import register

# Fixed deterministic scoring direction for U1 (64 dims, one-decimal
# values so the SQL-side literal list is tiny and drift-free).
_WEIGHTS = [round(((i * 7) % 13 - 6) / 10.0, 1) for i in range(64)]


@cache
def _weighted_score():
    """U1: Arrow-batched numpy dot against a fixed weight vector —
    the whole batch arrives as one pandas Series, the kernel is a
    single vectorized matmul, not a per-row loop."""
    import numpy as np

    @F.pandas_udf("double")
    def weighted_score(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype("float64")  # (batch, 64)
        return pd.Series(mat @ np.asarray(_WEIGHTS))

    return weighted_score


@register(
    "u1_pandas_vector_score",
    oracle=f"""
    SELECT vec_id,
           ROUND(list_dot_product(embedding::DOUBLE[],
                 [{", ".join(str(w) for w in _WEIGHTS)}]::DOUBLE[]), 4) + 0.0
             AS score
    FROM embeddings
    WHERE vec_id < 1000
    """,
)
def u1_pandas_vector_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: scalar pandas UDF (Arrow transfer, numpy kernel). The plan
    must show ArrowEvalPython, never BatchEvalPython (asserted in
    tests/test_plans.py)."""
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    return emb.select(
        "vec_id",
        # + 0.0 normalizes IEEE negative zero (a dot product can land
        # on -epsilon, which rounds to -0.0 in both engines but hashes
        # differently from +0.0)
        (F.round(_weighted_score()("embedding"), 4) + 0.0).alias("score"),
    )


@cache
def _top3_sum():
    """U3: grouped-agg pandas UDAF — integer-exact (no float drift
    against the oracle's list-based equivalent)."""

    @F.pandas_udf("long")
    def top3_sum(n_chars: pd.Series) -> int:
        return int(n_chars.nlargest(3).sum())

    @F.pandas_udf("long")
    def n_rows(n_chars: pd.Series) -> int:
        return int(len(n_chars))

    return top3_sum, n_rows


@register(
    "u3_udaf_top3_chars",
    oracle="""
    SELECT lang,
           CAST(list_sum(list_slice(list_sort(list(n_chars), 'DESC'), 1, 3)) AS BIGINT)
               AS top3_chars,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
)
def u3_udaf_top3_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: custom aggregates (sum of the 3 largest doc lengths per
    language, plus a UDAF row count — Spark disallows mixing
    GROUPED_AGG pandas UDFs with JVM aggregates in one ``agg``).
    Partial aggregation does NOT apply to Python UDAFs, so each
    group's column ships to one worker: acceptable for |groups| ≫
    |executors| and bounded group width, which is the rule for any
    custom UDAF at 100 TB."""
    top3_sum, n_rows = _top3_sum()
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        top3_sum("n_chars").alias("top3_chars"),
        n_rows("n_chars").alias("n_docs"),
    )


@cache
def _split_sentences():
    """U4: Python UDTF — one input row fans out to N output rows; the
    extension point for generators built-ins can't express (here a
    trivial sentence splitter, deliberately matching a pure-SQL
    oracle)."""

    @F.udtf(
        returnType="doc_id: bigint, sentence: string, n_words: int",
        useArrow=True,
    )
    class SplitSentences:
        def eval(self, doc_id, text):  # noqa: ANN001 — signature fixed by Spark
            for s in text.split(". "):
                yield doc_id, s, len(s.split())

    return SplitSentences


@register(
    "u4_udtf_sentences",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, '. ')) AS sentence,
           CAST(len(string_split(unnest(string_split(text, '. ')), ' ')) AS INT)
               AS n_words
    FROM documents
    WHERE doc_id < 500
    """,
)
def u4_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: LATERAL UDTF over a bounded document sample."""
    spark.udtf.register("split_sentences", _split_sentences())
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500).select(
        "doc_id", "text"
    ).createOrReplaceTempView("u4_docs")
    return spark.sql(
        "SELECT s.* FROM u4_docs, LATERAL split_sentences(doc_id, text) s"
    )


@register(
    "u5_arrow_batch_kernel",
    oracle="""
    SELECT lang,
           COUNT(*)                                        AS n_docs,
           CAST(SUM(len(text)) AS BIGINT)                  AS total_chars,
           CAST(COUNT(DISTINCT substr(md5(text), 1, 4)) AS BIGINT) AS n_digest_prefixes
    FROM documents
    GROUP BY lang
    """,
)
def u5_arrow_batch_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: mapInArrow — the lowest-overhead Python boundary (raw Arrow
    RecordBatches, no pandas materialization). The kernel computes
    md5 digest prefixes + char lengths with pyarrow.compute, i.e. the lane a
    tokenizer or codec that already speaks Arrow would use; the
    aggregation afterwards is plain JVM. Completes the graded UDF
    ladder: pandas_udf (u1), GROUPED_AGG (u3), UDTF (u4), Arrow-batch
    map (u5).

    Scale shape: mapInArrow streams batches through the Python worker
    with zero row pivoting — the boundary cost is serialization of
    exactly the projected columns (Catalyst prunes to doc_id, lang,
    text). The digest step mirrors content-addressable dedup at
    100 TB, where hashing IS the scan bottleneck and batch-level
    C-speed kernels are mandatory."""
    import hashlib

    import pyarrow as pa

    def digest_batches(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            texts = tbl.column("text").to_pylist()
            prefixes = [hashlib.md5(t.encode()).hexdigest()[:4] for t in texts]
            yield pa.RecordBatch.from_arrays(
                [
                    tbl.column("lang").combine_chunks(),
                    pa.compute.utf8_length(tbl.column("text").combine_chunks()),
                    pa.array(prefixes, type=pa.string()),
                ],
                names=["lang", "n_chars", "digest_prefix"],
            )

    d = table(spark, sf_dir, "documents").select("lang", "text")
    mapped = d.mapInArrow(
        digest_batches, "lang string, n_chars int, digest_prefix string"
    )
    return mapped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("digest_prefix").alias("n_digest_prefixes"),
    )


@register(
    "u2_grouped_map_normalize",
    oracle="""
    SELECT lang, doc_id,
           ROUND(CASE WHEN MAX(n_chars) OVER w = MIN(n_chars) OVER w THEN 0.5
                      ELSE (n_chars - MIN(n_chars) OVER w) * 1.0
                           / (MAX(n_chars) OVER w - MIN(n_chars) OVER w)
                 END + 1e-9, 6) AS scaled
    FROM documents
    WINDOW w AS (PARTITION BY lang)
    """,
)
def u2_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: grouped-map applyInPandas — per-language min-max scaling
    where each group's WHOLE frame lands in one Arrow batch and the
    kernel sees it as a pandas DataFrame (the API for logic that
    genuinely needs the full group: per-group model fits, group-wise
    imputation). The oracle is the equivalent window formulation —
    which is also the honest scale note: when the per-group logic IS
    expressible as window algebra, windows win (no Python boundary,
    no group-must-fit-in-memory constraint); applyInPandas is for
    when it isn't. Completes the graded UDF ladder u1-u5.

    The integer-ratio scaling is bit-identical in pandas and SQL;
    ties in the constant-group case pin to 0.5 on both engines."""
    import pandas as pd

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["n_chars"].min(), pdf["n_chars"].max()
        if hi == lo:
            s = pd.Series(0.5, index=pdf.index)
        else:
            s = (pdf["n_chars"] - lo) * 1.0 / (hi - lo)
        return pd.DataFrame(
            {"lang": pdf["lang"], "doc_id": pdf["doc_id"], "scaled": (s + 1e-9).round(6)}
        )

    d = table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return d.groupBy("lang").applyInPandas(scale, "lang string, doc_id long, scaled double")

@register(
    "u6_cogrouped_map",
    oracle="""
    WITH o AS (
        SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
        FROM orders WHERE o_custkey < 500 GROUP BY 1
    ),
    c AS (
        SELECT c_custkey AS k, c_mktsegment,
               CAST(c_acctbal AS DECIMAL(18,6)) AS bal
        FROM customer WHERE c_custkey < 500
    )
    SELECT c.k AS custkey, c.c_mktsegment AS segment,
           CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(ROUND(COALESCE(o.spend, 0) - c.bal, 2) AS DOUBLE)
               AS spend_minus_bal
    FROM c LEFT JOIN o ON o.k = c.k
    """,
)
def u6_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6: co-grouped map (`cogroup(...).applyInPandas`) — both sides
    of a key are delivered to ONE Python kernel as two pandas frames
    (FlatMapCoGroupsInPandas): the API for per-key reconciliation
    logic that needs full visibility of both sides at once
    (merge_asof per key, per-entity ledger matching, custom
    conflation). Here each customer's orders are reconciled against
    the account row — integer/decimal arithmetic, so the pandas
    output is bit-identical to the relational oracle.

    The honest scale note mirrors u2: when the per-key logic IS
    relational (as this demo deliberately is), the join wins — no
    Python boundary, no both-sides-of-key-in-memory constraint.
    cogroup is for when it isn't. One shuffle per side on the key;
    the 500-key probe bound keeps the graded run constant-cost at
    any corpus scale. Completes the Arrow ladder u1-u6."""
    import pandas as pd

    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 500)
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_totalprice").cast("decimal(18,6)").alias("price"),
        )
    )
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 500)
        .select(
            F.col("c_custkey").alias("k"),
            "c_mktsegment",
            F.col("c_acctbal").cast("decimal(18,6)").alias("bal"),
        )
    )

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if right.empty:  # no customer row for this key: nothing to emit
            return pd.DataFrame(
                columns=["custkey", "segment", "n_orders", "spend_minus_bal"]
            )
        row = right.iloc[0]
        spend = left["price"].sum() if not left.empty else 0
        return pd.DataFrame(
            {
                "custkey": [int(row["k"])],
                "segment": [row["c_mktsegment"]],
                "n_orders": [len(left)],
                "spend_minus_bal": [float(round(spend - row["bal"], 2))],
            }
        )

    return (
        o.groupBy("k")
        .cogroup(c.groupBy("k"))
        .applyInPandas(
            reconcile,
            "custkey long, segment string, n_orders long, spend_minus_bal double",
        )
    )


@cache
def _iter_scorer():
    """U7: ITERATOR-form scalar pandas UDF — the expensive-init-once
    surface: the 'model' (here a 3-entry weight table) loads ONCE per
    Python worker, then every Arrow batch streams through the same
    closure. The per-row arithmetic is vectorized numpy; only the
    setup runs per-worker instead of per-batch."""
    import numpy as np

    @F.pandas_udf("double")
    def iter_score(
        it: Iterator[Tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.Series]:
        weights = np.array([0.5, 1.5, 2.5])  # one-time per-worker init
        for uid, val in it:
            w = weights[(uid.to_numpy() % 3).astype("int64")]
            yield pd.Series(val.to_numpy() * w)

    return iter_score


@register(
    "u7_iterator_pandas_udf",
    oracle="""
    SELECT event_id,
           ROUND(value * (CASE CAST(user_id % 3 AS INT)
                          WHEN 0 THEN 0.5 WHEN 1 THEN 1.5
                          ELSE 2.5 END), 4) + 0.0 AS weighted
    FROM events WHERE event_id < 2000
    """,
)
def u7_iterator_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U7: Iterator[pd.Series] → Iterator[pd.Series] pandas UDF — the
    third scalar-UDF shape next to u1 (plain series) and u5
    (mapInArrow): per-WORKER one-time initialization amortized over
    all Arrow batches, the sanctioned pattern for model-loading UDFs
    (a real scorer loads its weights file here, not per batch). The
    plan shows ArrowEvalPython like u1; semantics are graded against
    the plain CASE expression the tiny stand-in 'model' encodes."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    scorer = _iter_scorer()
    return ev.select(
        "event_id",
        (F.round(scorer("user_id", "value"), 4) + 0.0).alias("weighted"),
    )


@cache
def _pandas_mean():
    import numpy as np

    @F.pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        return float(np.mean(v.to_numpy()))

    return pmean


@register(
    "u8_pandas_window_agg",
    oracle="""
    SELECT event_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                 + 1e-9, 4) + 0.0 AS rolling_mean
    FROM events WHERE user_id < 30
    """,
)
def u8_pandas_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U8: a GROUPED_AGG pandas UDF used as a WINDOW function — the
    fourth UDF surface (after u1 scalar, u7 iterator, u3 group-agg):
    Spark evaluates the Arrow-batched aggregate once per frame, which
    is how a custom rolling statistic (a numpy/scipy kernel Spark
    lacks) runs over ordered frames without leaving the window
    operator. The stand-in kernel is a plain mean so DuckDB's AVG
    OVER the identical 4-row frame grades it; a real deployment swaps
    in the library call with zero plan changes. Bounded frame (3
    PRECEDING) over a high-cardinality user partition."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "event_id",
        (F.round(_pandas_mean()("value").over(w) + 1e-9, 4) + 0.0).alias(
            "rolling_mean"
        ),
    )


@register(
    "u9_grouped_arrow_topchars",
    oracle="""
    WITH counted AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM documents GROUP BY lang
    )
    SELECT lang, n_docs, total_chars, max_chars,
           ROUND(total_chars * 1.0 / n_docs + 1e-9, 4) AS mean_chars
    FROM counted
    """,
)
def u9_grouped_arrow_topchars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U9: applyInArrow — the fifth Python boundary (after u1 scalar
    pandas, u2 grouped-map pandas, u5 mapInArrow, u7 iterator): a
    grouped-map kernel that receives each group as a RAW pyarrow
    Table, no pandas materialization at all. The lowest-overhead
    grouped surface for kernels that already speak Arrow (tokenizers,
    Arrow-native ML featurizers): zero-copy columnar access in, one
    RecordBatch out. The stand-in kernel computes per-group integer
    stats with pyarrow.compute so DuckDB aggregates grade the whole
    path exactly; a real deployment swaps the kernel body with zero
    plan changes. Scale: one shuffle on the group key (5 langs here —
    production keys are high-cardinality; tiny-key demo bounded by
    the fixture's lang domain), Arrow batches stream group-at-a-time
    through the worker."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        chars = tbl.column("n_chars")
        total = pc.sum(chars).as_py()
        return pa.table(
            {
                "lang": [tbl.column("lang")[0].as_py()],
                "n_docs": pa.array([n], type=pa.int64()),
                "total_chars": pa.array([total], type=pa.int64()),
                "max_chars": pa.array(
                    [pc.max(chars).as_py()], type=pa.int64()
                ),
                "mean_chars": pa.array(
                    [round(total / n + 1e-9, 4) + 0.0], type=pa.float64()
                ),
            }
        )

    d = table(spark, sf_dir, "documents").select("lang", "n_chars")
    return d.groupBy("lang").applyInArrow(
        stats,
        schema="lang string, n_docs long, total_chars long, "
        "max_chars long, mean_chars double",
    )


@cache
def _long_word_stats():
    """U10: ARROW-OPTIMIZED regular Python UDF (Spark 4's
    ``useArrow=True``) — row-at-a-time author ergonomics, Arrow-batch
    transfer: the sixth and last Python execution boundary (after
    pandas scalar u1, grouped map u2, UDAF u3, UDTF u4, mapInArrow u5,
    iterator u7, window agg u8, applyInArrow u9). Integer outputs —
    no float discipline needed."""

    @F.udf("long", useArrow=True)
    def n_long_words(text: str) -> int:
        if text is None:  # NULL survives the boundary as None
            return None
        return sum(1 for w in text.lower().split(" ") if len(w) > 5)

    @F.udf("long", useArrow=True)
    def max_word_len(text: str) -> int:
        if text is None:
            return None
        return max((len(w) for w in text.lower().split(" ")), default=0)

    return n_long_words, max_word_len


@register(
    "u10_arrow_optimized_udf",
    oracle="""
    SELECT doc_id,
           CAST(LEN(LIST_FILTER(string_split(lower(text), ' '),
                                w -> LENGTH(w) > 5)) AS BIGINT) AS n_long_words,
           CAST(CASE WHEN text IS NULL THEN NULL
                     ELSE GREATEST(LIST_MAX(list_transform(
                         string_split(lower(text), ' '), w -> LENGTH(w))), 0)
                END AS BIGINT)                                  AS max_word_len
    FROM documents
    WHERE doc_id < 400
    """,
)
def u10_arrow_optimized_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U10: Spark 4's arrow-optimized REGULAR Python UDF
    (``F.udf(..., useArrow=True)``) — scalar row semantics authored
    like a classic UDF but executed over Arrow batches: the plan shows
    ArrowEvalPython, never the row-pickling BatchEvalPython plancheck
    bans. Graded against a pure-SQL re-derivation, so the boundary's
    value fidelity (UTF-8 round-trip, long coercion) is hash-checked,
    completing the Python-boundary census u1–u9 started. NULL text
    propagates as None→NULL identically on both sides by construction
    (guarded in the UDFs, CASE'd in the oracle) — latent on these
    fixtures, which carry no null texts (code-review r6b).

    In the engine's own terms the SQL version IS the right plan (JVM
    higher-order functions, no Python at all) — this query exists to
    grade the BOUNDARY, like u1/u5; the bounded doc_id < 400 filter
    keeps the deliberately-slow path off the fact table's hot
    volume."""
    n_long, max_len = _long_word_stats()
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return d.select(
        "doc_id",
        n_long("text").alias("n_long_words"),
        max_len("text").alias("max_word_len"),
    )


@cache
def _unpack_dims():
    """U11: POLYMORPHIC Python UDTF — no static returnType; the output
    schema is computed at ANALYSIS time from the constant `n` argument
    (Spark 4's ``analyze`` static method). One registered function
    serves any requested width: the schema-on-demand extension point
    for feature unpacking, pivot-like expansion, or typed multimodal
    metadata projection, where the column count is a query parameter
    rather than a code change."""
    from pyspark.sql.types import DoubleType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @F.udtf(useArrow=True)
    class UnpackDims:
        @staticmethod
        def analyze(vec: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if n.value is None or not isinstance(n.value, int):
                raise ValueError(
                    "unpack_dims: n must be a constant integer — the "
                    "schema is fixed at analysis time"
                )
            st = StructType()
            for i in range(n.value):
                st = st.add(f"d{i}", DoubleType())
            return AnalyzeResult(st)

        def eval(self, vec, n):  # noqa: ANN001 — signature fixed by Spark
            if vec is None:
                yield tuple([None] * n)
            else:
                yield tuple(float(v) for v in vec[:n])

    return UnpackDims


@register(
    "u11_polymorphic_udtf",
    oracle="""
    SELECT vec_id,
           embedding[1]::DOUBLE AS d0,
           embedding[2]::DOUBLE AS d1,
           embedding[3]::DOUBLE AS d2,
           embedding[4]::DOUBLE AS d3
    FROM embeddings
    WHERE vec_id < 300
    """,
)
def u11_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U11: the analyze-time-schema UDTF graded end to end — LATERAL
    unpack of the first 4 embedding dims into typed DOUBLE columns,
    where the column set (d0..d3) exists only because ``analyze`` saw
    the literal 4. Value fidelity is exact: the UDTF only COPIES
    float32 values into doubles (same widening as the oracle's
    ::DOUBLE cast), no arithmetic, so the hash gate needs no rounding.
    Sixth Python-boundary class after u1/u2/u4/u5-u9/u10: scalar UDF,
    grouped map, static UDTF, Arrow kernels, arrow-UDF — and now the
    polymorphic UDTF analysis path. Bounded (vec_id < 300) like every
    deliberately-Python boundary probe — the plan the engine would
    ship for bulk unpacking is the pure-JVM getItem projection the
    oracle expresses."""
    spark.udtf.register("unpack_dims", _unpack_dims())
    table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300).select(
        "vec_id", "embedding"
    ).createOrReplaceTempView("u11_vecs")
    return spark.sql(
        "SELECT v.vec_id, s.* FROM u11_vecs v,"
        " LATERAL unpack_dims(embedding, 4) s"
    )


@cache
def _lang_profile_udtf():
    """U12: UDTF over a TABLE argument with PARTITION BY / ORDER BY —
    Spark routes each partition's rows through ONE instance (eval per
    row, terminate once), giving custom per-group streaming-fold
    semantics with guaranteed intra-partition order: the generalized
    grouped-map where output need not be pandas-shaped and state is
    explicit."""

    @F.udtf(
        returnType="lang string, n_docs bigint, total_chars bigint,"
        " first3_ids string",
        useArrow=True,
    )
    class LangProfile:
        def __init__(self):
            self.lang = None
            self.n = 0
            self.chars = 0
            self.first3: list[str] = []

        def eval(self, row):  # noqa: ANN001 — signature fixed by Spark
            self.lang = row["lang"]
            self.n += 1
            self.chars += int(row["n_chars"])
            if len(self.first3) < 3:
                self.first3.append(str(row["doc_id"]))

        def terminate(self):
            if self.lang is not None:
                yield self.lang, self.n, self.chars, ",".join(self.first3)

    return LangProfile


@register(
    "u12_table_arg_udtf",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)  AS total_chars,
           array_to_string(list_sort(LIST(doc_id))[1:3], ',') AS first3_ids
    FROM documents
    GROUP BY lang
    """,
)
def u12_table_arg_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U12: the TABLE-argument UDTF boundary graded end to end —
    `FROM lang_profile(TABLE(docs) PARTITION BY lang ORDER BY doc_id)`
    folds each language's documents through one UDTF instance in
    doc_id order and emits a single summary row from terminate().
    The first3_ids column is ORDER-SENSITIVE: it hash-matches the
    oracle's sorted-list prefix only if Spark actually delivers rows
    in the declared ORDER BY within each partition — so the query
    grades the ordering contract, not just the fold totals. Seventh
    Python-boundary class (after scalar/grouped-map/static-UDTF/
    Arrow-kernel/arrow-UDF/polymorphic-UDTF): partitioned stateful
    table functions.

    Scale shape: PARTITION BY shuffles once on lang; each partition
    streams through eval() with O(1) state (count, sum, 3 ids) — the
    applyInPandas alternative materializes each group as a DataFrame,
    this holds only the fold state. Python is the deliberate subject
    under test; the pure-JVM twin IS the oracle's GROUP BY."""
    spark.udtf.register("lang_profile", _lang_profile_udtf())
    table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    ).createOrReplaceTempView("u12_docs")
    return spark.sql(
        "SELECT * FROM lang_profile(TABLE(u12_docs)"
        " PARTITION BY lang ORDER BY doc_id)"
    )
