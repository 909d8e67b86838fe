"""Shared DuckDB CTE chain for the BM25 posting index (VERDICT r9 #4).

One string, imported by every oracle that reads the BM25 index (l4n in
llm_text.py, l68d in llm_sim.py, l14b's lexical branch in
llm_pipeline.py), so the three oracles can never drift from each other
— the same discipline as llm_sim._SPARSE_IDX_CTES for the TF-IDF
index.

The chain mirrors operators/sparse.py::bm25_postings EXACTLY, in the
same association order, so the quantized weight doubles agree bit-wise
before the floor:

    w = floor( ln(1 + (N - df + 0.5)/(df + 0.5))
               * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
               * quant + 0.5 )

Unigrams only (BM25's dl is the token count — shingles would
double-count length); no df cut (the +1-smoothed idf is strictly
positive at any df). avgdl = AVG over exact per-doc BIGINT sums, so
both engines divide the same exact integers.
"""

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUANT = 1000

# CTEs: toks -> tf (unigram term frequencies) -> dl / stats / dfp -> w
BM25_IDX_CTES = """
    toks AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '),
                           x -> x <> '') AS ts
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(ts) AS term FROM toks)
        GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(dl) AS avgdl FROM dl),
    dfp AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    w AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               CAST(FLOOR(
                   LN(CAST(1 AS DOUBLE)
                      + (CAST(s.n AS DOUBLE) - dfp.df + CAST(0.5 AS DOUBLE))
                        / (dfp.df + CAST(0.5 AS DOUBLE)))
                   * tf.tf * CAST(2.2 AS DOUBLE)
                   / (tf.tf + CAST(1.2 AS DOUBLE)
                      * (CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                         + CAST(0.75 AS DOUBLE) * d.dl / s.avgdl))
                   * CAST(1000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS w
        FROM tf
        JOIN dl d USING (doc_id)
        JOIN dfp USING (term)
        CROSS JOIN stats s
    )
"""
