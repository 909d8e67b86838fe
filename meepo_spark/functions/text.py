"""Text-analysis primitives for the training-data pipeline: tokenize,
BPE-ish pre-tokenize, language-ID heuristic, quality scoring, content
fingerprinting (SURVEY.md §2.B L4).

Each helper has a DuckDB-SQL twin (``*_SQL`` format strings) so graded
queries keep one definition per operator for both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Small English stopword set for quality scoring (public, standard).
STOPWORDS = ("the", "of", "and", "to", "in", "a", "is", "for", "on", "with")


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens, lowercased."""
    return F.split(F.lower(col), " ")


WS_TOKENS_SQL = "string_split(lower({c}), ' ')"


def bpe_tokens(col: Column) -> Column:
    """BPE-style pre-tokens (letters / digits / punct singles)."""
    return F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)


BPE_TOKENS_SQL = r"regexp_extract_all({c}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')"


def lang_id(col: Column) -> Column:
    """Character-class language heuristic over {de,en,es,fr,zh}.

    Deterministic and cheap (one regex pass per class); at 100 TB this
    is a pure map-side column. Precedence: CJK → zh, distinctive
    Spanish marks → es, German umlauts/ß → de, French accents → fr,
    generic é → fr, else en.
    """
    return (
        F.when(col.rlike("[一-鿿]"), "zh")
        .when(col.rlike("[ñ¿¡]|í|ó|á|ú"), "es")
        .when(col.rlike("[äöüß]"), "de")
        .when(col.rlike("[èêàçœû]|é"), "fr")
        .otherwise("en")
    )


LANG_ID_SQL = (
    "CASE WHEN regexp_matches({c}, '[一-鿿]') THEN 'zh' "
    "WHEN regexp_matches({c}, '[ñ¿¡]|í|ó|á|ú') THEN 'es' "
    "WHEN regexp_matches({c}, '[äöüß]') THEN 'de' "
    "WHEN regexp_matches({c}, '[èêàçœû]|é') THEN 'fr' "
    "ELSE 'en' END"
)


def quality_score(text: Column, n_tokens: Column, n_stop: Column, n_punct: Column) -> Column:
    """Composite quality score in [0,1]: length saturation + stopword
    ratio + punctuation penalty. The standard cheap pre-filter before
    expensive dedup/training steps."""
    len_score = F.least(F.length(text) / F.lit(400.0), F.lit(1.0))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_tokens, F.lit(1))
    raw = 0.5 * len_score + 0.4 * F.least(stop_ratio * 5, F.lit(1.0)) - 0.3 * punct_ratio
    return F.round(F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0)) + 1e-9, 4)


def content_fingerprint(col: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct lowercase token set. Two docs with identical vocabulary
    collide — the canonical cheap near-dup prefilter."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(ws_tokens(col))), " "))


CONTENT_FINGERPRINT_SQL = (
    "md5(array_to_string(list_sort(list_distinct(string_split(lower({c}), ' '))), ' '))"
)
