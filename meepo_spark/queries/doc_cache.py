"""Session-scoped tokenized-documents frame (VERDICT r3 #5).

The l-family text queries each re-scan ``documents`` and re-split
``text`` into whitespace tokens; a production pipeline tokenizes the
corpus ONCE and fans every stage out from the tokenized frame. Cache
semantics (keying, cap, LRU, eviction) live in the shared
``_session_cache.SessionFrameCache`` — the same instance discipline
as the near-dup pair cache in ``llm_dedup.py``.

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
from meepo_spark.queries._session_cache import SessionFrameCache

_CACHE = SessionFrameCache(max_per_app=3)


def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    return d.select("*", toks.alias("toks"), F.size(toks).alias("n_toks"))


def tokenized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _CACHE.get(spark, sf_dir, _build)
