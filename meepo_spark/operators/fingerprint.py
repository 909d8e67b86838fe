"""Rolling-hash document fingerprinting: Karp-Rabin polynomial gram
hashes + MOSS-style winnowing (SURVEY.md §2.B L4 "document
fingerprinting"; Schleimer/Wilkerson/Aiken, SIGMOD'03).

The pipeline per document, all JVM-side array expressions (no Python
boundary, no shuffle — a pure projection fused into the scan):

1. ``token_codes``  — each token to an integer code in ``[0, M)``
   via the repo's md5-parity trick (first 15 md5 hex chars as a
   60-bit integer, reduced mod M), so a DuckDB oracle recomputes the
   identical code stream.
2. ``gram_hashes``  — the Karp-Rabin polynomial hash of every
   k-token gram: ``h = fold(acc * B + c) mod M`` over the gram's
   codes. Evaluated per-gram via slice+fold: with token-level grams
   the window is small (k <= 8), so direct O(n*k) evaluation inside
   whole-stage codegen beats the O(n) incremental recurrence, whose
   Catalyst encoding needs an O(n) array-state rebuild per step
   (O(n^2) copies — the same argument that sized operators/bpe's
   fold). The two forms are the same function; the DuckDB oracle
   replays this exact per-gram fold.
3. ``winnow``       — slide a w-gram window over the hash sequence,
   keep each window's minimum, then the distinct set. Guarantee: any
   shared token run of length >= w + k - 1 contributes at least one
   common fingerprint; expected density is 2/(w+1) fingerprints per
   gram (the SIGMOD'03 bound — l53 measures it).

Scale shape at 100 TB: fingerprinting is embarrassingly parallel
(per-row projection); downstream candidate generation explodes
(doc_id, fp) and equi-joins on the 8-byte fp — the standard inverted
index, bucketed by fingerprint, never all-pairs. Stop-fingerprint
removal (document-frequency cap, l54) keeps boilerplate fps from
creating quadratic hot buckets, exactly like the stopword cut in
text indexing.

All arithmetic stays in ``[0, M*B + M)`` ≈ 2^33 — exact BIGINT in
both engines, so fingerprints are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Polynomial base / modulus. M*B + M < 2^63 with huge margin; M prime
# keeps the code/gram distribution uniform under the md5 codes.
B = 8191
M = 1_000_003


def token_codes(toks: Column) -> Column:
    """Integer code in [0, M) per token (md5-parity, oracle-replayable)."""
    return F.transform(
        toks,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"), F.lit(M)
        ),
    )


def gram_hashes(codes: Column, k: int) -> Column:
    """Karp-Rabin hash of every k-gram of the code sequence."""
    m = F.size(codes) - (k - 1)
    empty = F.array().cast("array<bigint>")
    return F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda j: F.aggregate(
                F.slice(codes, j, k),
                F.lit(0).cast("long"),
                lambda acc, c: F.pmod(acc * B + c, F.lit(M)),
            ),
        ),
    ).otherwise(empty)


def winnow(gh: Column, w: int) -> Column:
    """Distinct window-minima of the gram-hash sequence (fingerprints).

    Documents with fewer than w grams (but at least one) emit the
    single global minimum, so every hashable document gets >= 1
    fingerprint — the standard short-document convention."""
    m = F.size(gh) - (w - 1)
    empty = F.array().cast("array<bigint>")
    return (
        F.when(
            m >= 1,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), m),
                    lambda j: F.array_min(F.slice(gh, j, w)),
                )
            ),
        )
        .when(F.size(gh) >= 1, F.array(F.array_min(gh)))
        .otherwise(empty)
    )


def with_fingerprints(df, toks_col: str, k: int, w: int, out: str = "fps"):
    """Add a winnowed-fingerprint column, staging codes and gram
    hashes as REAL columns between selects. This is load-bearing, not
    style: a higher-order-function lambda re-evaluates any inline
    subtree it references once per element, so a single nested
    expression recomputes the md5 code array per gram and the gram
    array per window — O(n^2)+ md5 calls per document (measured: hung
    at sf0.1). Materialized attributes make each lambda reference an
    O(1) column read, and CollapseProject keeps the stages separate
    because the aliases are non-cheap and multiply referenced."""
    return (
        df.withColumn("__fp_codes", token_codes(F.col(toks_col)))
        .withColumn("__fp_gh", gram_hashes(F.col("__fp_codes"), k))
        .withColumn(out, winnow(F.col("__fp_gh"), w))
        .drop("__fp_codes", "__fp_gh")
    )


def candidate_pairs(e, max_df: int = 20, min_shared: int = 3):
    """MOSS candidate generation over an exploded (doc_id, fp, ...)
    frame: ONE shuffle keyed on the 8-byte fp collects each
    fingerprint's posting list; buckets larger than ``max_df`` are
    the stop-fingerprint cut (boilerplate that would otherwise create
    quadratic hot buckets); pairs are expanded MAP-SIDE inside each
    surviving <= max_df-member bucket (<= C(max_df, 2) = 190 per fp,
    a pure array expression — no self-join, the subtree is computed
    once); a final aggregate on (id_a, id_b) counts shared
    fingerprints and keeps pairs >= ``min_shared``. Bucketed pair
    expansion is the same discipline as the LSH verify stage
    (operators/dedup): pair work tracks the dup structure, never
    corpus². Any extra columns of ``e`` ride along as ``<col>_a`` /
    ``<col>_b`` — they join the pair GROUP BY, so they MUST be
    functionally dependent on doc_id (lang, source, split...); a
    per-fingerprint column would fragment each pair's shared count
    and silently drop real candidates below ``min_shared``. The
    single source of truth for both the graded l54/l57 queries and
    the SCALE.md §19 probe."""
    extras = [c for c in e.columns if c not in ("doc_id", "fp")]
    member = F.struct(F.col("doc_id").alias("doc_id"), *extras)
    # array_sort orders by doc_id (first struct field), so a < b
    # pairing is deterministic regardless of collect_list order
    buckets = (
        e.groupBy("fp")
        .agg(F.collect_list(member).alias("ms"))
        .filter(F.size("ms") <= max_df)
        .withColumn("ms", F.array_sort("ms"))
    )
    prs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda a, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    pair_cols = [
        F.col("pr.a.doc_id").alias("id_a"),
        *[F.col(f"pr.a.{c}").alias(f"{c}_a") for c in extras],
        F.col("pr.b.doc_id").alias("id_b"),
        *[F.col(f"pr.b.{c}").alias(f"{c}_b") for c in extras],
    ]
    keys = ["id_a", *[f"{c}_a" for c in extras], "id_b", *[f"{c}_b" for c in extras]]
    return (
        buckets.withColumn("prs", prs)
        .withColumn("pr", F.explode_outer("prs"))
        .filter(F.col("pr").isNotNull())
        .select(*pair_cols)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def explode_fps(df, fps_col: str = "fps", out: str = "fp"):
    """Explode the fingerprint set WITHOUT re-triggering the inline
    blowup ``with_fingerprints`` exists to prevent: a plain explode
    lets InferFiltersFromGenerate add ``size(fps) > 0``, which
    predicate pushdown then rewrites through every staged Project —
    substituting the full winnow(gram(codes)) tree back into one
    per-row filter condition (the measured sf0.1 hang). explode_outer
    is exempt from that rule (outer generates infer no filter), and
    the null filter on the OUTPUT attribute cannot be pushed below
    the Generate, so the staging survives."""
    return (
        df.withColumn(out, F.explode_outer(F.col(fps_col)))
        .filter(F.col(out).isNotNull())
        .drop(fps_col)
    )


# --- DuckDB twins (generated SQL, the pack_first_fit_sql discipline) ---


def token_codes_sql(toks_expr: str) -> str:
    return (
        f"list_transform({toks_expr}, t -> "
        f"CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % {M})"
    )


def gram_hashes_sql(codes_expr: str, k: int) -> str:
    """Same per-gram Karp-Rabin fold; DuckDB list_reduce has no init,
    so the 0 accumulator is prepended (the repo's t20/l46 recipe)."""
    return f"""
    CASE WHEN len({codes_expr}) >= {k} THEN
        list_transform(
            range(1, len({codes_expr}) - {k} + 2),
            j -> list_reduce(
                list_concat([CAST(0 AS BIGINT)], ({codes_expr})[j : j + {k - 1}]),
                (acc, c) -> (acc * {B} + c) % {M}))
    ELSE CAST([] AS BIGINT[]) END
    """


def winnow_sql(gh_expr: str, w: int) -> str:
    return f"""
    CASE WHEN len({gh_expr}) >= {w} THEN
        list_distinct(list_transform(
            range(1, len({gh_expr}) - {w} + 2),
            j -> list_min(({gh_expr})[j : j + {w - 1}])))
    WHEN len({gh_expr}) >= 1 THEN [list_min({gh_expr})]
    ELSE CAST([] AS BIGINT[]) END
    """


def winnow_ctes(k: int, w: int) -> str:
    """Shared oracle CTE chain: documents -> (doc_id, lang, fps).

    Emitted as steps (codes/gh/fps) rather than one nested expression
    so the generated SQL stays readable and each stage evaluates once.
    """
    codes = token_codes_sql("toks")
    return f"""
    t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
          FROM documents),
    tc AS (SELECT doc_id, lang, {codes} AS codes FROM t),
    tg AS (SELECT doc_id, lang, {gram_hashes_sql('codes', k)} AS gh
           FROM tc),
    tf AS (SELECT doc_id, lang, len(gh) AS n_grams,
                  {winnow_sql('gh', w)} AS fps
           FROM tg)
    """
