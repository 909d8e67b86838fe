"""Shared session-scoped persisted-frame cache (code-review r4 #5/#7).

One implementation of the (applicationId, sf_dir)-keyed persist cache
used by the near-dup pair frame (``llm_dedup``) and the tokenized
documents frame (``doc_cache``) — previously two near-verbatim copies
whose cap/eviction logic had to be kept in sync by hand.

Semantics:
- keyed by (applicationId, sf_dir): a new session or SF never sees a
  stale frame;
- frames from OTHER applications are evicted on every miss (their
  context may already be stopped — that unpersist failure class is
  swallowed, anything else propagates);
- at most ``max_per_app`` live frames per application, true LRU: a
  HIT refreshes the entry's recency (pop + reinsert), so repeated use
  of one sf_dir never gets it evicted by later one-off touches.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class SessionFrameCache:
    def __init__(self, max_per_app: int = 3) -> None:
        self.max_per_app = max_per_app
        self._frames: dict[tuple, DataFrame] = {}

    def _evict(self, key: tuple) -> None:
        from py4j.protocol import Py4JError

        stale = self._frames.pop(key)
        try:
            stale.unpersist()
        except (Py4JError, RuntimeError, AttributeError):
            pass  # owning SparkContext already stopped — only that
            # failure class is expected here; anything else propagates

    def get(
        self,
        spark: SparkSession,
        sf_dir: str,
        build: Callable[[SparkSession, str], DataFrame],
    ) -> DataFrame:
        app_id = spark.sparkContext.applicationId
        key = (app_id, sf_dir)
        df = self._frames.get(key)
        if df is not None:
            # refresh recency so the hottest frame is evicted last
            self._frames.pop(key)
            self._frames[key] = df
            return df
        # Evict BEFORE building (ADVICE r4): if a cross-app unpersist
        # ever failed outside the swallowed classes, failing here loses
        # nothing, whereas failing after build() would orphan the
        # just-persisted frame outside the cache.
        for k in [k for k in self._frames if k[0] != app_id]:
            self._evict(k)
        own = [k for k in self._frames if k[0] == app_id]
        for k in own[: max(0, len(own) + 1 - self.max_per_app)]:
            self._evict(k)
        df = build(spark, sf_dir).persist()
        self._frames[key] = df
        return df
