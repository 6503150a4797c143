"""Text-analysis column expressions for training-data pipelines.

All JVM-native (regex/string built-ins) — no UDFs — so they run
inside WholeStageCodegen over billions of documents. Regex patterns
are restricted to the dialect subset shared by Java regex and RE2 so
the same semantics are oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Portable token pattern (identical meaning in Java regex and RE2).
WORD_RE = "[a-z0-9]+"
# BPE-ish units: runs of letters, single digits, or single
# non-alphanumeric-non-space marks — a cheap proxy for subword token
# counts used to budget LLM training data.
BPE_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"

# Tiny per-language stopword sets for the n-gram/lexicon language-ID
# heuristic. Chosen to be discriminative and ASCII-only.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "que", "con", "para"],
}


def words(text: Column) -> Column:
    """Array of lowercase word tokens."""
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), 0)


def word_count(text: Column) -> Column:
    return F.size(words(text))


def bpe_token_count(text: Column) -> Column:
    """Approximate subword-token count (BPE-ish regex units)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_RE), 0))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[^a-zA-Z0-9 ]"), 0))


def stopword_count(text: Column, lang: str = "en") -> Column:
    pattern = "\\b(" + "|".join(LANG_STOPWORDS[lang]) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), 0))


def quality_score(text: Column) -> Column:
    """Heuristic document-quality score in [0, 100]: rewards
    reasonable length and stopword density, penalizes punctuation
    noise. Integer arithmetic end-to-end → engine-portable."""
    n_chars = F.length(text)
    n_words = word_count(text)
    n_stop = stopword_count(text, "en")
    n_punct = punct_count(text)
    length_term = F.when(n_chars >= 200, 40).when(n_chars >= 50, 25).otherwise(5)
    # n_words > 0 gate: a zero-word (punctuation-only/empty) document
    # must not collect the full stopword-density award via the
    # vacuous 0*100 >= 0*5 (round-9 review).
    stop_term = (
        F.when((n_words > 0) & (n_stop * 100 >= n_words * 5), 30)
        .when(n_stop > 0, 15)
        .otherwise(0)
    )
    punct_term = F.when(n_punct * 100 > n_chars * 10, 0).otherwise(30)
    return (length_term + stop_term + punct_term).cast("int")


def lang_id(text: Column) -> Column:
    """Lexicon-hit language ID: argmax of per-language stopword hits,
    ties broken by fixed language order (en, fr, de, es); 'und' when
    nothing matches."""
    lowered = F.lower(text)
    hits = {
        lang: F.size(
            F.regexp_extract_all(
                lowered, F.lit("\\b(" + "|".join(sw) + ")\\b"), 0
            )
        )
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def normalized_fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-collapsed,
    lowercased text — the exact-dedup key that survives incidental
    formatting differences."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def rolling_hash(text: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over characters (Spark-side only; uses
    higher-order aggregate). h = (h*base + ascii(c)) % mod."""
    chars = F.filter(F.split(text, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def char_shingles(text: Column, k: int = 5) -> Column:
    """Array of k-char shingles of the lowercased text (positions are
    1-based; empty array when the text is shorter than k)."""
    lowered = F.lower(text)
    n = F.length(lowered)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: lowered.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
