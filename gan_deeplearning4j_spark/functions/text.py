"""Text-analysis functions (north-star scope, BASELINE.json: LLM-data-pipeline
operators over the ``documents`` table).

All pure Catalyst expressions over ``string`` columns — tokenization, quality
stats, language-ID heuristics, fingerprints. At 100 TB these run inside the
scan stage (no shuffle, codegen'd); only the rolling-hash fingerprint touches
higher-order funcs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny per-language stopword table for the n-gram/stopword language-ID
# heuristic. Public knowledge (most-frequent function words).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
    "zh": ["的", "是", "了", "在"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def n_distinct_tokens(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_ratio(text: Column, words: list[str]) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits / F.size(toks)


def distinct_ratio(text: Column) -> Column:
    """Quality signal: vocabulary diversity (near-0 → degenerate repetition)."""
    toks = tokens(text)
    return F.size(F.array_distinct(toks)) / F.size(toks)


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.length(stripped).cast("double") / F.length(text)


def lang_id(text: Column) -> Column:
    """Language-ID heuristic: highest stopword-hit-rate wins, 'und' if no
    hits. (The reference has no text ops; this is north-star scope.)"""
    toks = tokens(text)

    def hit_count(words: list[str]):
        # closure factory: a default-arg lambda would be read as the
        # two-arg (element, index) filter form
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = [(lang, hit_count(words)) for lang, words in STOPWORDS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    for lang, score in reversed(scores):
        result = F.when(score == best_score, F.lit(lang)).otherwise(result)
    return F.when(best_score <= 0, F.lit("und")).otherwise(result)


def token_count_bpe_ish(text: Column) -> Column:
    """Token counting with a BPE-ish regex: word pieces + digits + punct
    runs, the usual pre-tokenizer shape."""
    pieces = F.split(F.trim(text), r"(?=[^\w])|(?<=[^\w])")
    return F.size(F.filter(pieces, lambda p: (F.length(F.trim(p)) > 0)))


def fingerprint64(text: Column) -> Column:
    """Document fingerprint: xxhash64 of normalized text (lowercased,
    whitespace-collapsed). Cheap exact-dup key at scale."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm)
