"""Text-analysis column expressions for large-scale corpus pipelines.

All JVM-side built-ins (split / size / transform / aggregate / md5) —
no Python UDFs, so language stats over 100 TB of documents stay inside
whole-stage codegen.

Tokenisation contract: split on single spaces, drop empties. Simple by
design — the same contract is expressible in ANSI SQL, which is what makes
every operator here oracle-checkable against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English function-word list used by the language-ID heuristic and
# quality scoring. Deliberately tiny and hard-coded: it must be replicable
# in the SQL oracle.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "at", "by", "it", "be", "this",
]


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties removed."""
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are function words — a cheap fluency signal."""
    words = stopwords or EN_STOPWORDS
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def md5_fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint (hex md5). Used for exact dedup
    and as the hash family for MinHash — md5 exists verbatim in every SQL
    engine, so signatures are oracle-checkable."""
    return F.md5(col)
