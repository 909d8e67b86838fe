"""Composed-pipeline scaling probe (VERDICT r7 #3, SCALE.md §21).

Every probe in SCALE.md §§5-20 measures ONE operator; a real 100 TB
curation job chains them. This probe runs the composed
curation -> BPE-tokenize -> sequence-pack -> epoch-shuffle pipeline
(the l6 + l47/l62 + l50 + l17 stage family) END-TO-END over a
replicated documents corpus and records, per multiple:

* the wall of the FULL composed chain (one DAG, forced by one 1-row
  checksum aggregate), and the wall of each stage in ISOLATION on a
  localCheckpoint-materialized input — the composition ratio
  full / sum(isolated) is the no-hidden-rematerialization claim
  under test: if composing the stages made Catalyst re-derive an
  upstream stage per downstream consumer (the session-frame-cache /
  shared-subtree failure mode), the full-chain wall would blow past
  the isolated sum;
* the growth exponent of the full chain vs corpus multiple — the
  composition must stay near-linear if every stage's own probe did.

Stages (the production shapes, not toys):
  A curation   — exact-dedup survivors (md5 min-id) + n_chars floor +
                 benchmark-decontamination overlap cut (l6's DAG);
  B tokenize   — a trained BPE merge table applied through the Arrow
                 kernel (compile_threshold=0 — the 30-50k-merge
                 production path, l62's); per-doc token count out;
  C pack       — pack_first_fit bounded-block greedy first-fit into
                 capacity-2048 sequences (l50's operator);
  D epoch-shuffle — 3 epochs of md5(epoch:block:seq) deterministic
                 ordering keys + the 256-bucket assignment (l17's
                 hash scheme, on PACKED SEQUENCES not docs).

Replicas are token-suffixed (disjoint shingle/word spaces, the
corpus_scaling.py discipline) and doc_id-shifted, so dedup/pack
structure scales linearly instead of measuring quadratic dup load.
The merge table is trained ONCE on the 1x corpus outside the timed
region (production trains once and ships the artifact; training
itself is corpus-decoupled after round 0 — SCALE.md §17).

GUARD: exits non-zero if the full-chain wall exponent over the probed
multiples exceeds MAX_EXPONENT (1.55 — §15's "generous band" rule:
the gate owns exponents, the bench guard owns percent drift), or if
the composition ratio full / sum(isolated stage walls) exceeds
MAX_COMPOSITION (1.6) at any multiple.

Usage: python tools/pipeline_scaling.py [sf_dir] [mults]
       (defaults: /root/testdata/sf0.1, "1,8,32")
Prints one JSON line per multiple plus a summary line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from meepo_spark.operators.bpe import bpe_apply, bpe_merge_table
from meepo_spark.operators.packing import pack_first_fit
from meepo_spark.session import get_spark

MAX_EXPONENT = 1.55
MAX_COMPOSITION = 1.6
CAPACITY = 2048
MAX_DOC_TOKENS = 2048  # clip before packing (l50's truncation census)


def replicated_docs(spark, sf_dir: str, mult: int) -> DataFrame:
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if mult == 1:
        return base.select("doc_id", "lang", "text", "n_chars")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    shift = base.agg(F.max("doc_id")).first()[0] + 1
    return base.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * shift).alias("doc_id"),
        "lang",
        # token suffix keeps replica word/shingle spaces disjoint
        F.concat(F.col("text"), F.lit(" zz"), F.col("rep").cast("string")).alias(
            "text"
        ),
        F.col("n_chars"),
    )


def stage_a_curation(d: DataFrame) -> DataFrame:
    """l6's DAG: md5 exact-dedup survivors + length floor + benchmark
    shingle-overlap decontamination (<20%)."""
    toks = F.split(F.lower("text"), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0)))
    t = d.select(
        "doc_id",
        "lang",
        "text",
        "n_chars",
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 3), " "))
        ).alias("sh"),
    )
    survivors = t.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    sh = t.select("doc_id", F.explode("sh").alias("s"))
    bench = (
        sh.filter(F.col("doc_id") < 200)
        .select("s")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    overlap = (
        sh.filter(F.col("doc_id") >= 200)
        .join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_ov"),
        )
    )
    return (
        t.filter(F.col("n_chars") >= 40)
        .join(survivors.select("doc_id"), "doc_id")
        .join(overlap, "doc_id")
        .filter(5 * F.col("n_ov") < F.col("n_sh"))
        .select("doc_id", "lang", "text")
    )


def stage_b_tokenize(kept: DataFrame, merges: DataFrame) -> DataFrame:
    """Apply the trained merge table through the ARROW KERNEL path to
    every word; per-doc BPE token count out (the l47/l62 application
    grain, composed at doc grain for packing)."""
    words = kept.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    seg = bpe_apply(words, merges, compile_threshold=0)
    return seg.groupBy("doc_id").agg(
        F.sum(F.size("syms")).cast("long").alias("n_tokens")
    )


def stage_c_pack(counted: DataFrame) -> DataFrame:
    items = counted.select(
        "doc_id", F.least(F.col("n_tokens"), F.lit(MAX_DOC_TOKENS)).alias("n")
    )
    return pack_first_fit(items, capacity=CAPACITY, block_width=128)


def stage_d_epoch_shuffle(packed: DataFrame) -> DataFrame:
    """l17's deterministic per-epoch ordering over PACKED sequences:
    one (block, seq) row per sequence, 3 epochs, md5 ordering key +
    256-bucket assignment."""
    seqs = packed.groupBy("block", "seq").agg(
        F.sum("n").cast("long").alias("fill")
    )
    epochs = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("epoch")
    keyed = seqs.select("block", "seq", "fill", epochs).select(
        "epoch",
        "fill",
        F.md5(
            F.concat_ws(":", F.col("epoch"), F.col("block"), F.col("seq"))
        ).alias("h"),
    )
    return keyed.select("epoch", "fill", F.substring("h", 1, 2).alias("bkt"))


def force(df: DataFrame) -> tuple[int, float]:
    """One 1-row checksum aggregate — forces full execution without
    collecting data."""
    t0 = time.perf_counter()
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # pmod before summing: a raw sum of 64-bit hashes overflows
        # long under ANSI within a few thousand rows
        F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias(
            "chk"
        ),
    ).first()
    return int(row["n"]), time.perf_counter() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,8,32").split(",")]
    spark = get_spark("pipeline_scaling")

    # trained artifact: once, on the 1x corpus, outside timed regions
    base_words = (
        replicated_docs(spark, sf_dir, 1)
        .select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    merges = bpe_merge_table(base_words, 8).localCheckpoint()

    # warmup: full chain once at the smallest multiple, untimed —
    # first execution pays plan compile/codegen that would inflate the
    # 1x wall and understate the exponent
    force(
        stage_d_epoch_shuffle(
            stage_c_pack(
                stage_b_tokenize(
                    stage_a_curation(replicated_docs(spark, sf_dir, mults[0])),
                    merges,
                )
            )
        )
    )

    results = []
    for mult in mults:
        d = replicated_docs(spark, sf_dir, mult)
        rec: dict = {"mult": mult}

        # full composed chain: one DAG, one forcing aggregate
        full = stage_d_epoch_shuffle(
            stage_c_pack(stage_b_tokenize(stage_a_curation(d), merges))
        )
        rec["n_epoch_rows"], wfull = force(full)

        # isolated stages on materialized inputs
        t0 = time.perf_counter()
        a_mat = stage_a_curation(d).localCheckpoint()
        rec["n_kept"] = a_mat.count()
        wa = time.perf_counter() - t0
        t0 = time.perf_counter()
        b_mat = stage_b_tokenize(a_mat, merges).localCheckpoint()
        rec["n_docs_tok"] = b_mat.count()
        wb = time.perf_counter() - t0
        t0 = time.perf_counter()
        c_mat = stage_c_pack(b_mat).localCheckpoint()
        rec["n_items"] = c_mat.count()
        wc = time.perf_counter() - t0
        _, wd = force(stage_d_epoch_shuffle(c_mat))

        rec["wall_full"] = round(wfull, 2)
        rec["stage_walls_isolated"] = {
            "curation": round(wa, 2),
            "tokenize": round(wb, 2),
            "pack": round(wc, 2),
            "epoch_shuffle": round(wd, 2),
        }
        iso_sum = wa + wb + wc + wd
        rec["isolated_sum"] = round(iso_sum, 2)
        rec["composition_ratio"] = round(wfull / max(iso_sum, 1e-9), 3)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # exponent of the full-chain wall over the probed range: a
    # least-squares log-log fit across ALL probed multiples (not just
    # the endpoint pair), so a noisy endpoint can't fake the slope.
    # With a single multiple there is no slope — report composition
    # ratios only rather than dividing by log(1)=0.
    composed_ok = all(r["composition_ratio"] <= MAX_COMPOSITION for r in results)
    distinct_mults = {r["mult"] for r in results}
    if len(distinct_mults) < 2:
        summary = {
            "exponent_full_chain": None,
            "note": "single multiple probed — no exponent; "
            "pass >=2 distinct multiples for a slope",
            "max_composition": MAX_COMPOSITION,
            "composition_ok": composed_ok,
            "ok": composed_ok,
        }
        print(json.dumps(summary), flush=True)
        return 0 if summary["ok"] else 1
    xs = [math.log(r["mult"]) for r in results]
    ys = [math.log(max(r["wall_full"], 1e-9)) for r in results]
    n = len(xs)
    mean_x, mean_y = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mean_x) ** 2 for x in xs)
    sxy = sum((x - mean_x) * (y - mean_y) for x, y in zip(xs, ys))
    exponent = sxy / sxx
    summary = {
        "exponent_full_chain": round(exponent, 3),
        "max_exponent": MAX_EXPONENT,
        "max_composition": MAX_COMPOSITION,
        "composition_ok": composed_ok,
        "ok": exponent <= MAX_EXPONENT and composed_ok,
    }
    print(json.dumps(summary), flush=True)
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
