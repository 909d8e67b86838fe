"""Replicated-corpus scaling probe for the LSH band pipeline and the
IVF / PQ ANN search (VERDICT r4 #3, SCALE.md §10).

Replays the sf0.1 corpora at 10-50x volume — the throughput.py
protocol applied to the LLM operators — and records, per multiple:

* wall seconds for the full operator (the exponent vs volume is the
  headline: linear-ish = the bucketing/pruning is doing its job);
* total shuffle bytes + records, summed over every Exchange in the
  EXECUTED adaptive plan (SQL metrics, same machinery as
  tests/test_window_waivers.py) — the number that becomes the network
  bill on a real cluster;
* peak-partition rows: the hottest shuffle partition's row count,
  computed exactly by hashing the operator's shuffle key (LSH band
  key / IVF cell id) mod spark.sql.shuffle.partitions — the skew
  number that decides whether one straggler task serializes the stage
  at 1000 executors.

Document replicas are token-suffixed so shingle spaces stay DISJOINT
(near-dup structure scales linearly — see dedup_scaling.py's note on
why naive replication measures quadratic verify load instead);
embedding replicas are vec_id-shifted identical vectors (search cost
scales with corpus size; geometry is irrelevant to the cost model).

Usage: python tools/corpus_scaling.py [sf_dir] [mults]
       (defaults: /root/testdata/sf0.1, "10,20,40")
Prints one JSON line per (operator, multiple).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meepo_spark.operators.dedup import (
    band_keys,
    minhash_signatures,
    shingle_hash_set,
)
from meepo_spark.operators.similarity import ivf_cosine_topk, pq_topk
from meepo_spark.session import get_spark

DIM = 64


# --- executed-plan shuffle metrics (test_window_waivers machinery) ----
def _unwrap(node):
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return _unwrap(node.executedPlan())
    if "QueryStage" in name:
        return _unwrap(node.plan())
    return node


def _walk(node, acc):
    node = _unwrap(node)
    acc.append(node)
    ch = node.children()
    for i in range(ch.length()):
        _walk(ch.apply(i), acc)
    return acc


def shuffle_totals(qe) -> dict:
    bytes_w = records_w = n_exchanges = 0
    for n in _walk(qe.executedPlan(), []):
        if "Exchange" not in n.nodeName():
            continue
        it = n.metrics().iterator()
        m = {}
        while it.hasNext():
            kv = it.next()
            m[kv._1()] = kv._2().value()
        if "shuffleBytesWritten" in m:
            n_exchanges += 1
            bytes_w += m["shuffleBytesWritten"]
            records_w += m.get("shuffleRecordsWritten", 0)
    return {
        "shuffle_bytes": int(bytes_w),
        "shuffle_records": int(records_w),
        "n_exchanges": n_exchanges,
    }


def run_counted(df):
    """Execute via the query's own QueryExecution (no row collect) and
    return (row_count, wall_s, shuffle metric dict)."""
    qe = df._jdf.queryExecution()
    t0 = time.time()
    n = qe.toRdd().count()
    wall = time.time() - t0
    return n, wall, shuffle_totals(qe)


def peak_partition_rows(keys_df, key_cols, n_part: int) -> int:
    """Exact hottest-shuffle-partition row count for a hash exchange
    on ``key_cols``: rows per pmod(hash(keys), n_part), maxed."""
    return (
        keys_df.groupBy(
            F.pmod(F.hash(*key_cols), F.lit(n_part)).alias("__p")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )


# --- corpora -----------------------------------------------------------
def replicated_docs(spark, sf_dir: str, mult: int):
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    parts = []
    for i in range(mult):
        txt = F.array_join(
            F.transform(F.split("text", " "), lambda t: F.concat(t, F.lit(f"_{i}"))),
            " ",
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                txt.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def replicated_embeddings(spark, sf_dir: str, mult: int):
    base = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    parts = [
        base.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("c_id"),
            F.col("embedding").alias("c_vec"),
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# --- probes ------------------------------------------------------------
def probe_lsh(spark, sf_dir: str, mult: int, n_part: int) -> dict:
    docs = replicated_docs(spark, sf_dir, mult)
    sh = docs.select(
        "doc_id", shingle_hash_set(F.col("text"), 3).alias("shingles")
    )
    exploded = sh.select(
        F.col("doc_id").alias("id"), F.explode("shingles").alias("shingle")
    )
    sig = minhash_signatures(exploded, 96)
    banded = sig.select(
        "id", F.explode(band_keys(96, 48)).alias("bk")
    )
    # band-bucket candidate pairs (the LSH shuffle itself): self-join
    # on the band key, earlier-id orientation, distinct pairs
    a = banded.select(F.col("id").alias("id_a"), "bk")
    b = banded.select(F.col("id").alias("id_b"), "bk")
    cand = (
        a.join(b, "bk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    n_pairs, wall, shuf = run_counted(cand)
    peak = peak_partition_rows(banded, ["bk"], n_part)
    return {
        "op": "lsh_band_pipeline",
        "mult": mult,
        "docs": docs.count(),
        "candidate_pairs": n_pairs,
        "wall_s": round(wall, 2),
        "peak_partition_rows": int(peak),
        **shuf,
    }


def probe_ivf(spark, sf_dir: str, mult: int, n_part: int) -> dict:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = replicated_embeddings(spark, sf_dir, mult)
    topk = ivf_cosine_topk(
        q, c, dim=DIM, k=5, n_centroids=16, n_probe=8,
        pair_filter=F.col("q_id") != F.col("c_id"),
    )
    n, wall, shuf = run_counted(topk)
    return {
        "op": "ivf_search",
        "mult": mult,
        "corpus": c.count(),
        "rows_out": n,
        "wall_s": round(wall, 2),
        **shuf,
    }


def probe_pq(spark, sf_dir: str, mult: int, n_part: int) -> dict:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = replicated_embeddings(spark, sf_dir, mult)
    topk = pq_topk(
        q, c, dim=DIM, k=5, m=16, ksub=16, rerank=50,
        pair_filter=F.col("q_id") != F.col("c_id"),
    )
    n, wall, shuf = run_counted(topk)
    return {
        "op": "pq_adc_search",
        "mult": mult,
        "corpus": c.count(),
        "rows_out": n,
        "wall_s": round(wall, 2),
        **shuf,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [10, 20, 40]
    )
    spark = get_spark("corpus-scaling")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # warm codegen/JIT once at the smallest multiple so ratios compare
    # steady-state plans, not first-run compilation
    probe_lsh(spark, sf_dir, 1, n_part)
    probe_ivf(spark, sf_dir, 1, n_part)
    probe_pq(spark, sf_dir, 1, n_part)
    for m in mults:
        print(json.dumps(probe_lsh(spark, sf_dir, m, n_part)), flush=True)
    for m in mults:
        print(json.dumps(probe_ivf(spark, sf_dir, m, n_part)), flush=True)
    for m in mults:
        print(json.dumps(probe_pq(spark, sf_dir, m, n_part)), flush=True)


if __name__ == "__main__":
    main()
