"""Text-analysis operators for training-data pipelines over the documents
table: token counting, quality scoring, language-ID heuristic, fingerprinting.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage codegen) — no Python UDFs. Each has an exact ANSI-SQL oracle in
__spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]

# deterministic marker-word sets for the language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "la"],
    "es": ["el", "y", "de"],
}


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: split on whitespace AND letter/digit
    boundaries (a cheap BPE stand-in, regex only)."""
    pieces = F.split(F.trim(text), r"\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])")
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(pieces))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    )
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(no_punct)) / F.greatest(
        F.length(text), F.lit(1)
    )


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality score: favors medium length, some
    stopwords (real prose), low punctuation noise."""
    n = token_count(text).cast("double")
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.least(sw * 4.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(text) * 4.0, F.lit(0.0))
    return F.round((len_score + sw_score + punct_pen) / 3.0, 6)


def normalize_text(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Stable document fingerprint (md5 of normalized text — md5 so the
    DuckDB oracle computes the identical value)."""
    return F.md5(normalize_text(text))


def langid_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit counts per language over the token array."""
    toks = tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """argmax over marker-word counts; ties broken by fixed lang order;
    'und' (undetermined) when no marker hits at all."""
    scores = langid_scores(text)
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):  # earlier langs win ties → apply last
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_subtokens"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(avg_token_len(c), 6).alias("avg_token_len"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
        predict_lang(c).alias("lang_pred"),
    )
