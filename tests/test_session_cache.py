"""SessionFrameCache semantics (code-review r4 #5/#7): shared by the
near-dup pair cache and the tokenized-docs cache."""

from __future__ import annotations


def test_session_frame_cache_is_lru_not_fifo(spark):
    from meepo_spark.queries._session_cache import SessionFrameCache

    cache = SessionFrameCache(max_per_app=2)
    built = []

    def builder(tag):
        def build(s, sf_dir):
            built.append(tag)
            return s.range(3)
        return build

    a1 = cache.get(spark, "A", builder("A"))
    cache.get(spark, "B", builder("B"))
    # HIT on A refreshes recency — under FIFO, A would be evicted next
    a2 = cache.get(spark, "A", builder("A"))
    assert a2 is a1 and built == ["A", "B"]
    cache.get(spark, "C", builder("C"))  # evicts B (least recent), not A
    a3 = cache.get(spark, "A", builder("A"))
    assert a3 is a1, "hot entry must survive the cap eviction"
    assert built == ["A", "B", "C"], f"unexpected rebuilds: {built}"
    cache.get(spark, "B", builder("B"))  # B was evicted -> rebuilds
    assert built == ["A", "B", "C", "B"]
    for k in list(cache._frames):
        cache._evict(k)
