"""Text-analysis operators for training-data pipelines — pure DataFrame ops.

Everything here stays JVM-side (built-in pyspark.sql.functions, whole-stage
codegen) — no Python in the hot path. These are the operations a large-scale
LLM training-data pipeline runs over a `documents(doc_id, text, lang,
source, n_chars)` table: token counting, quality scoring, language-ID
heuristics, and deterministic fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tokenization contract shared with the DuckDB oracles in __spark_entry__:
# non-empty runs split on whitespace.
_WS = r"\s+"


def token_col(text: Column) -> Column:
    """array<string> of non-empty whitespace-separated tokens."""
    return F.filter(F.split(text, _WS), lambda x: x != "")


def with_token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(token_col(F.col(text_col))))


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap quality signals: length, token count, mean token length,
    punctuation/digit/space ratios, uppercase ratio. All codegen'd."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = token_col(t)
    safe = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", F.size(toks))
        .withColumn(
            "mean_token_len",
            F.when(F.size(toks) > 0, (F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))).cast("double") / F.size(toks)).otherwise(F.lit(0.0)),
        )
        .withColumn("punct_ratio", (n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))).cast("double") / safe)
        .withColumn("digit_ratio", (n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("double") / safe)
        .withColumn("space_ratio", (n_chars - F.length(F.regexp_replace(t, r" ", ""))).cast("double") / safe)
        .withColumn("upper_ratio", (n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))).cast("double") / safe)
    )


# minimal per-language stopword lists for the n-gram-free language-ID
# heuristic: score = fraction of tokens that are stopwords of each language.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "en", "por", "que"],
}


def with_lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language scores + argmax guess (heuristic lang-ID).

    Pure `F.*` set arithmetic: lowercase, tokenize, count stopword hits per
    language with array_intersect-free aggregate (duplicates counted).
    """
    toks = token_col(F.lower(F.col(text_col)))
    out = df
    score_cols = []
    for lang, words in _STOPWORDS.items():
        hits = F.size(F.filter(toks, lambda x: x.isin(*words)))
        col = f"score_{lang}"
        out = out.withColumn(col, F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0)))
        score_cols.append(col)
    # argmax over the fixed language set, deterministic tie-break by order
    guess = F.lit("unk")
    best = F.lit(0.0)
    for lang in _STOPWORDS:
        c = F.col(f"score_{lang}")
        guess = F.when(c > best, F.lit(lang)).otherwise(guess)
        best = F.when(c > best, c).otherwise(best)
    return out.withColumn("lang_guess", guess)


# GPT-2-flavored pre-tokenization classes: word runs, digit runs, single
# punctuation marks — the "BPE-ish regex" count that approximates subword
# token counts without a vocabulary (the real BPE merge table would refine
# these splits, never cross them).
_BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def with_bpe_token_count(df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens") -> DataFrame:
    """Approximate subword-token count via the BPE pre-tokenization regex —
    JVM-side `regexp_extract_all`, whole-stage codegen'd."""
    return df.withColumn(
        out, F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_ISH), F.lit(0)))
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Deterministic 64-bit document fingerprint (xxhash64 of normalized
    text) — the exact-dedup key. Normalization: collapse whitespace, lower."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), _WS, " "))
    return df.withColumn(out, F.xxhash64(norm))
