"""Session-scoped tokenized-documents frame (VERDICT r3 #5).

The l-family text queries each re-scan ``documents`` and re-split
``text`` into whitespace tokens; a production pipeline tokenizes the
corpus ONCE and fans every stage out from the tokenized frame. Same
pattern (and same cap/eviction discipline) as the near-dup pair cache
in ``llm_dedup.py``: keyed by (applicationId, sf_dir) so a new session
or SF never sees a stale frame, persisted, capped at
``_MAX_PER_APP`` live sf_dirs per application with LRU eviction.

The frame is ``documents`` plus:

- ``toks``   — lowercased whitespace tokens (``ws_tokens``)
- ``n_toks`` — ``size(toks)``

Consumers keep their own filters/derived expressions; only the
scan+split is shared. Queries needing the RAW (case-preserving) split
still derive it from ``text``, which stays a column of the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.functions.text import ws_tokens

_CACHE: dict[tuple, DataFrame] = {}
_MAX_PER_APP = 3


def _evict(key: tuple) -> None:
    from py4j.protocol import Py4JError

    stale = _CACHE.pop(key)
    try:
        stale.unpersist()
    except (Py4JError, RuntimeError, AttributeError):
        pass  # owning SparkContext already stopped


def tokenized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir)
    df = _CACHE.get(key)
    if df is None:
        d = table(spark, sf_dir, "documents")
        toks = ws_tokens(F.col("text"))
        df = d.select(
            "*", toks.alias("toks"), F.size(toks).alias("n_toks")
        ).persist()
        for k in [k for k in _CACHE if k[0] != app_id]:
            _evict(k)
        own = [k for k in _CACHE if k[0] == app_id]
        for k in own[: max(0, len(own) + 1 - _MAX_PER_APP)]:
            _evict(k)
        _CACHE[key] = df
    return df
