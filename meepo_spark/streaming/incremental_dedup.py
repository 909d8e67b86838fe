"""Streaming incremental corpus dedup (VERDICT r3 #4) — the daily
training-data ingest shape, run as a ``foreachBatch`` pipeline:
every micro-batch of arriving documents is

  1. deduped WITHIN the batch (content-hash groupBy, min-id keeper —
     l1's kernel),
  2. probed against the existing corpus's content-hash index and every
     prior batch's survivors with a left-anti join (l10's two-stage
     O(batch)-not-O(corpus) shape),
  3. near-dup probed with the SAME MinHash-LSH machinery as the batch
     l2 family (``operators/dedup.py``: hashed shingles → seeded
     minhash signature → banded bucket keys): a surviving doc is
     rejected when a band collision with an earlier-id exact-survivor
     verifies at shingle-Jaccard ≥ threshold,
  4. appended to the survivor index as an idempotent per-batch
     partition (``batch=<id>`` subdir written with overwrite — a
     foreachBatch retry rewrites the same partition instead of
     duplicating rows).

The rejection rule — "d is a near-dup iff some EXACT-survivor e with
e.doc_id < d.doc_id verifies at J ≥ t" — is deliberately defined
against exact-survivor status (not against e's own near-dup fate), so
reject CHAINS a–b–c cannot make the outcome depend on where batch
boundaries fall. The batch-equivalence invariant asserted by
``tests/test_streaming.py`` additionally requires doc_ids to arrive
in NON-DECREASING order across batches (the replay convention): only
then do the streaming first-arrival exact keeper match the batch
min-id keeper, and the "earlier-id survivor" pool at each doc's
arrival contain every smaller id. Out-of-order ingest (late files,
backfills) degrades gracefully to first-arrival semantics — each
batch is still exactly deduped against everything already indexed —
but the admitted set then reflects arrival order, not global ids;
pipelines needing an order-free survivor rule run l2e's
connected-components pass over the accumulated index instead.

Scale notes: the per-batch work is O(batch · corpus-index), all
equi-joins — no all-pairs, no driver collect; the index carries
8-byte shingle hashes and band keys (not texts), and the corpus side
of the exact probe is a digest column a real deployment would also
bloom-filter (j12's kernel). Verification reads the candidate's
shingle hashes straight from the index; at trillion-doc scale that
column moves to a by-id join against the doc store (the l3l two-tier
discipline).
"""

from __future__ import annotations

import json
import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from meepo_spark.operators.dedup import (
    band_keys,
    minhash_signatures,
    shingle_hash_set,
)

INDEX_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("h", StringType()),
        StructField("shingles", ArrayType(LongType())),
        StructField(
            "bands",
            ArrayType(
                StructType(
                    [
                        StructField("band", IntegerType()),
                        StructField("bh", IntegerType()),
                    ]
                )
            ),
        ),
        StructField("rejected", BooleanType()),
    ]
)


def _survivor_features(
    docs: DataFrame, shingle_k: int, num_hashes: int, bands: int
) -> DataFrame:
    """(doc_id, lang, h, shingles, bands) for a batch of documents —
    the index row, minus the rejection verdict."""
    base = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        shingle_hash_set(F.col("text"), shingle_k).alias("shingles"),
    )
    sh = base.select(F.col("doc_id").alias("id"), F.explode("shingles").alias("shingle"))
    sig = minhash_signatures(sh, num_hashes)
    # band_keys is the SAME plan lsh_candidate_pairs uses — streaming
    # rejections and the batch recompute collide identically
    return base.join(
        sig.select(
            F.col("id").alias("doc_id"),
            band_keys(num_hashes, bands).alias("bands"),
        ),
        "doc_id",
    )


def _batch_dirs(
    spark: SparkSession, index_dir: str, exclude_batch: int | None = None
) -> list[str]:
    """The committed batch=<id> subdirs of the index (Hadoop FS, so
    any supported filesystem works), optionally excluding one batch —
    a REPLAYED batch must not read its own earlier commit as 'prior'."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch="):
            if exclude_batch is not None and name == f"batch={exclude_batch}":
                continue
            out.append(st.getPath().toString())
    return sorted(out)


def _prior_max_doc_id(index_dir: str, exclude_batch: int | None) -> int | None:
    """Max doc_id across prior batches' watermark sidecars — O(#batches)
    driver-side JSON reads, NOT a corpus scan. Sidecars live beside the
    index (local/NFS paths; a cloud deployment folds the same two
    integers into the sink's own commit metadata)."""
    best: int | None = None
    if not os.path.isdir(index_dir):
        return None
    for name in os.listdir(index_dir):
        if not name.startswith("batch="):
            continue
        if exclude_batch is not None and name == f"batch={exclude_batch}":
            continue
        wm = os.path.join(index_dir, name, "_wm.json")
        if os.path.exists(wm):
            try:
                with open(wm) as fh:
                    mx = json.load(fh).get("max_doc_id")
            except (json.JSONDecodeError, OSError):
                # A corrupt sidecar (pre-atomic-write legacy, or disk
                # damage) must not kill every future batch: the batch's
                # DATA commit is what matters; losing its watermark only
                # weakens the ordering check for this run.
                warnings.warn(
                    f"unreadable watermark sidecar {wm}; ordering check "
                    "degrades to the remaining sidecars",
                    stacklevel=2,
                )
                continue
            if mx is not None and (best is None or mx > best):
                best = mx
    return best


def read_survivor_index(
    spark: SparkSession, index_dir: str, exclude_batch: int | None = None
) -> DataFrame:
    """All survivor-index rows written so far (empty frame before the
    first batch commits). ``exclude_batch`` drops one batch's own
    partition — the retry-idempotence fix (code-review r4 #1): a
    foreachBatch REPLAY of batch N that read its own committed rows as
    'prior corpus' would exact-probe away every document in the batch
    and overwrite batch=N empty, silently losing it."""
    dirs = _batch_dirs(spark, index_dir, exclude_batch)
    if not dirs:
        return spark.createDataFrame([], INDEX_SCHEMA)
    return spark.read.schema(INDEX_SCHEMA).parquet(*dirs)


def admitted_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    """The admitted set: exact-survivors that were not near-dup
    rejected."""
    return read_survivor_index(spark, index_dir).filter(~F.col("rejected"))


def start_incremental_dedup(
    spark: SparkSession,
    src_dir: str,
    doc_schema,
    corpus_hashes: DataFrame,
    index_dir: str,
    checkpoint: str,
    threshold: float = 0.6,
    shingle_k: int = 3,
    num_hashes: int = 96,
    bands: int = 48,
    max_files_per_trigger: int = 1,
    enforce_replay_order: bool = False,
):
    """Run the incremental dedup pipeline over a document file stream
    to completion (availableNow) and return the finished query.

    ``corpus_hashes`` must be a (h: string) frame of the existing
    corpus's content digests — the only corpus state the exact probe
    needs.

    The batch-equivalence invariant (module docstring) requires
    doc_ids to arrive non-decreasing across batches, but
    FileStreamSource orders files by MODIFICATION TIME with
    nondeterministic tie-breaks (ADVICE r4) — coarse-mtime filesystems
    can reorder sequentially-appended chunks. The convention is
    therefore made structural: each batch commit records its
    (min, max) doc_id in a ``_wm.json`` sidecar, and every batch is
    checked against the prior watermark — a violation raises when
    ``enforce_replay_order`` (callers relying on batch-equivalence,
    e.g. doc_id-ordered replays, should pass True and give chunk files
    monotone mtimes), else warns and degrades to the documented
    first-arrival semantics."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # persist: the micro-batch is read once from source files, then
        # served from cache to BOTH the watermark min/max aggregate and
        # the dedup pipeline (hash, shingle, band) — without it the
        # watermark is a full extra scan of every batch's input.
        batch_df = batch_df.persist()
        try:
            _process_batch_inner(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    def _process_batch_inner(batch_df: DataFrame, batch_id: int) -> None:
        prior = read_survivor_index(spark, index_dir, exclude_batch=batch_id)
        lo, hi = batch_df.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).first()
        if lo is None:
            return  # empty batch: nothing to index or watermark
        prior_max = _prior_max_doc_id(index_dir, exclude_batch=batch_id)
        if prior_max is not None and lo < prior_max:
            msg = (
                f"incremental dedup batch {batch_id}: min doc_id {lo} < "
                f"prior batches' max {prior_max} — out-of-order arrival; "
                "admitted set reflects FIRST-ARRIVAL order, not global "
                "ids (batch-equivalence void for this run)"
            )
            if enforce_replay_order:
                raise RuntimeError(msg)
            warnings.warn(msg, stacklevel=2)
        # 1. within-batch exact dedup: min-id keeper per content hash
        hashed = batch_df.select("doc_id", "lang", "text", F.md5("text").alias("h"))
        keeper = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        kept = hashed.join(keeper, ["h", "doc_id"])
        # 2. exact probe vs corpus index and prior survivors
        seen = corpus_hashes.select("h").unionByName(prior.select("h"))
        exact_surv = kept.join(seen, "h", "left_anti")
        # 3. near-dup probe: band collisions vs earlier-id survivors
        # (prior batches and this batch), verified on shingle Jaccard
        feats = _survivor_features(exact_surv, shingle_k, num_hashes, bands)
        pool = prior.select("doc_id", "shingles", "bands").unionByName(
            feats.select("doc_id", "shingles", "bands")
        )
        d_side = feats.select(
            F.col("doc_id").alias("d_id"),
            F.col("shingles").alias("d_sh"),
            F.explode("bands").alias("bk"),
        )
        e_side = pool.select(
            F.col("doc_id").alias("e_id"),
            F.col("shingles").alias("e_sh"),
            F.explode("bands").alias("bk"),
        )
        cand = (
            d_side.join(e_side, "bk")
            .where(F.col("e_id") < F.col("d_id"))
            .select("d_id", "d_sh", "e_id", "e_sh")
            .distinct()
        )
        inter = F.size(F.array_intersect("d_sh", "e_sh")).cast("double")
        union = F.size("d_sh") + F.size("e_sh") - inter
        rejected = (
            cand.withColumn("j", inter / union)
            .filter(F.col("j") >= threshold)
            .select(F.col("d_id").alias("doc_id"))
            .distinct()
            .withColumn("rejected", F.lit(True))
        )
        out = (
            feats.join(rejected, "doc_id", "left")
            .withColumn("rejected", F.coalesce("rejected", F.lit(False)))
            .select(*[f.name for f in INDEX_SCHEMA.fields])
        )
        # 4. idempotent per-batch commit: retries rewrite, not append.
        # localCheckpoint severs the lineage back to the index scan
        # before writing INTO the index dir (read-path/write-path
        # nesting is otherwise rejected or racy).
        out.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            f"{index_dir}/batch={batch_id}"
        )
        # watermark sidecar AFTER the data commit (a retry that died
        # mid-write re-enters with exclude_batch and rewrites both).
        # tmp + fsync + atomic rename: a committed batch is never
        # redelivered, so a torn sidecar would otherwise persist forever
        # (same discipline as CommitLog._swap).
        wm_path = f"{index_dir}/batch={batch_id}/_wm.json"
        tmp = wm_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch": batch_id, "min_doc_id": lo, "max_doc_id": hi}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, wm_path)
        # rename durability needs the DIRECTORY entry persisted too —
        # a committed batch is never redelivered, so a rolled-back
        # rename would orphan this batch's watermark forever. (A crash
        # BEFORE the replace leaves an inert .tmp: readers open only
        # _wm.json, and _prior_max_doc_id degrades gracefully.)
        dfd = os.open(os.path.dirname(wm_path), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(
            "incremental dedup stream did not drain within 600 s — "
            "the survivor index is incomplete"
        )
    return q
