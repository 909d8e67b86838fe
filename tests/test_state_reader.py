"""streaming/state_reader.py — offline state-store introspection
(Spark 4 statestore / state-metadata readers). Pins the three claims
the module makes: state equals an independent batch recompute of the
same prefix, metadata inventories the store, and batch_id time-travels
to the pre-increment state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meepo_spark.streaming.state_reader import read_state, read_state_metadata


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), "id long, k string, v long"
    ).write.mode("append").json(path)


def _run_round(spark, src, ck, name):
    q = (
        spark.readStream.schema("id long, k string, v long")
        .json(src)
        .groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish"


BATCH1 = [(1, "a", 10), (2, "b", 20), (3, "a", 30)]
BATCH2 = [(4, "a", 5), (5, "c", 7)]


@pytest.fixture(scope="module")
def agg_checkpoint(spark, tmp_path_factory):
    """Two availableNow rounds of a keyed running aggregate; returns
    (src, ck) with state as of batch2 committed."""
    base = tmp_path_factory.mktemp("state_reader")
    src, ck = str(base / "src"), str(base / "ck")
    _write_batch(spark, src, BATCH1)
    _run_round(spark, src, ck, "sr_round1")
    _write_batch(spark, src, BATCH2)
    _run_round(spark, src, ck, "sr_round2")
    return src, ck


def test_state_equals_batch_recompute(spark, agg_checkpoint):
    src, ck = agg_checkpoint
    state = {
        (r.k): (r.total, r.n)
        for r in read_state(spark, ck).select(
            "k", F.col("sum").alias("total"), F.col("count").alias("n")
        ).collect()
    }
    expect = {
        r.k: (r.total, r.n)
        for r in spark.read.schema("id long, k string, v long")
        .json(src)
        .groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert state == expect == {"a": (45, 3), "b": (20, 1), "c": (7, 1)}


def test_state_metadata_inventories_the_store(spark, agg_checkpoint):
    _, ck = agg_checkpoint
    rows = read_state_metadata(spark, ck).collect()
    assert len(rows) == 1
    m = rows[0]
    assert m.operatorName == "stateStoreSave"
    assert m.numPartitions > 0
    assert m.minBatchId <= m.maxBatchId


def test_batch_id_time_travels_to_pre_increment_state(spark, agg_checkpoint):
    _, ck = agg_checkpoint
    meta = read_state_metadata(spark, ck).collect()[0]
    early = {
        r.k: r.sum
        for r in read_state(spark, ck, batch_id=meta.minBatchId).collect()
    }
    late = {
        r.k: r.sum
        for r in read_state(spark, ck, batch_id=meta.maxBatchId).collect()
    }
    assert early == {"a": 40, "b": 20}          # batch-1 prefix only
    assert late == {"a": 45, "b": 20, "c": 7}   # after batch 2
    assert meta.minBatchId < meta.maxBatchId


def test_unflattened_shape_keeps_structs(spark, agg_checkpoint):
    _, ck = agg_checkpoint
    df = read_state(spark, ck, flatten=False)
    assert set(df.columns) == {"key", "value", "partition_id"}


def test_flatten_prefixes_colliding_fields(spark):
    """A field name in BOTH structs (or shadowing partition_id) keeps
    its struct prefix so the flattened frame stays joinable by name
    (review finding: the docstring promised this before the code did).
    Exercised synthetically — real agg state uses positional field
    names, but custom stateful operators (transformWithState value
    schemas) can echo key fields verbatim."""
    from meepo_spark.streaming.state_reader import _flatten_state

    df = spark.createDataFrame(
        [((1, "x"), ("x", 5, 7), 3)],
        "key struct<k:long, partition_id:string>, "
        "value struct<k:string, total:long, n:long>, partition_id int",
    )
    flat = _flatten_state(df)
    assert flat.columns == [
        "key_k", "key_partition_id", "value_k", "total", "n", "partition_id"
    ]
    r = flat.collect()[0]
    assert (r.key_k, r.key_partition_id, r.value_k, r.total, r.n, r.partition_id) == (
        1, "x", "x", 5, 7, 3
    )


def test_flatten_raises_on_ambiguous_schema(spark):
    """If prefixing cannot disambiguate (a literal value_k field next
    to a clashing k), fail loudly instead of returning a frame whose
    first by-name reference throws AMBIGUOUS_REFERENCE."""
    import pytest as _pytest

    from meepo_spark.streaming.state_reader import _flatten_state

    df = spark.createDataFrame(
        [((1,), ("x", "y"), 3)],
        "key struct<k:long>, value struct<k:string, value_k:string>, "
        "partition_id int",
    )
    with _pytest.raises(ValueError, match="value_k"):
        _flatten_state(df)


def test_dedup_operator_state_is_readable(spark, tmp_path):
    """The reader works across operator types, not just aggregates:
    dropDuplicates state stores the seen-key set — reading it back
    IS the 'which keys is the stream holding' audit the module
    advertises. Keys flatten to columns; dedup state has no value
    payload beyond the marker struct."""
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _write_batch(spark, src, BATCH1)
    q = (
        spark.readStream.schema("id long, k string, v long")
        .json(src)
        .dropDuplicates(["k"])
        .writeStream.format("memory")
        .queryName("sr_dedup")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    meta = read_state_metadata(spark, ck).collect()
    assert len(meta) == 1 and meta[0].operatorName == "dedupe"
    state = read_state(spark, ck)
    assert sorted(r.k for r in state.collect()) == ["a", "b"]
