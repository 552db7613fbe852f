"""Text-analysis functions (SURVEY §2.11 L4) — tokenization, n-grams,
quality scoring, language heuristics, fingerprinting.

All pure Catalyst expressions (split / regexp / md5 / higher-order
array functions): vectorized JVM execution, no UDFs, scale-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace+punctuation word splitter; a BPE-ish superset would add
# sub-word merges, which is model-specific — token *counting* uses this.
_TOKEN_RE = r"[^\p{L}\p{N}]+"

# Tiny embedded stopword list for quality scoring / language signal.
_EN_STOPWORDS = (
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "on", "with", "as", "was", "be", "are", "this", "by", "at", "or",
)


def tokenize(text: Column) -> Column:
    """Lowercased word tokens; empty strings filtered out."""
    return F.filter(
        F.split(F.lower(text), _TOKEN_RE),
        lambda t: F.length(t) > 0,
    )


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles over the lowercased text (dedup unit)."""
    t = F.lower(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (joined by single spaces)."""
    toks = tokenize(text)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), k)
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokenize(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_EN_STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    """Share of alphabetic characters — a cheap garbled-text signal."""
    n_alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    return F.when(F.length(text) > 0, n_alpha.cast("double") / F.length(text)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band, alphabetic ratio,
    stopword presence, mean word length sanity.  Deterministic
    arithmetic only, so it is oracle-checkable in SQL."""
    toks = tokenize(text)
    n_tok = F.size(toks).cast("double")
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t).cast("double")) / n_tok,
    ).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(
        n_tok / F.lit(10.0)
    )
    word_ok = F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    score = (
        F.least(len_ok, F.lit(1.0)) * F.lit(0.4)
        + alpha_ratio(text) * F.lit(0.3)
        + F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0)) * F.lit(0.2)
        + word_ok * F.lit(0.1)
    )
    return F.round(score, 6)


def lang_guess(text: Column) -> Column:
    """N-gram/stopword language heuristic (en vs not-en demo tier;
    extend the marker lists per language at deployment).  Pure SQL so
    the operator stays in codegen at any scale."""
    return F.when(stopword_ratio(text) >= 0.08, F.lit("en")).otherwise(F.lit("other"))


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprint over whitespace/case-normalized text —
    md5 (cross-engine reproducible) of the canonical form."""
    canon = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(canon)


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram of the
    canonicalized text with a rolling window of the positions, keep
    the minimum hash of each w-window, return the distinct selected
    hashes sorted.

    Guarantee: any shared substring of length >= k + w - 1 between two
    documents yields at least one shared fingerprint, while only
    ~2/(w+1) of gram hashes are kept — the local, position-robust
    alternative to the whole-document hash above.

    Pure Catalyst higher-order expressions (sequence / transform /
    slice / array_min), so the operator is vectorized JVM work with no
    shuffle: at 100 TB it is a map-only pass.  md5 keeps the hash
    cross-engine reproducible (the DuckDB oracle computes the same
    list); production would swap in xxhash64 for speed without
    changing the plan shape.
    """
    canon = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    n_grams = F.greatest(F.length(canon) - F.lit(k - 1), F.lit(1))
    n_windows = F.greatest(n_grams - F.lit(w - 1), F.lit(1))
    # Each window hashes its own w grams directly (w*n total md5 calls).
    # The tempting grams-array-then-slice form is quadratic instead:
    # a lambda-captured array expression is re-evaluated per element,
    # so slice(grams, j, w) would recompute ALL n hashes for every one
    # of the n windows.
    picked = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.array_min(
            F.transform(
                F.sequence(j, F.least(j + F.lit(w - 1), n_grams)),
                lambda i: F.md5(F.substr(canon, i, F.lit(k))),
            )
        ),
    )
    return F.array_sort(F.array_distinct(picked))
