"""Text-analysis column functions for large-scale document pipelines.

Beyond-the-reference surface (BASELINE.json north star): token counting,
quality scoring, document fingerprinting, language-ID — each designed to
run over a 100 TB ``documents`` table, so everything here is built from
JVM-side expressions (split/regexp/aggregate) except language-ID's profile
scoring, which is a single Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A small deterministic stopword list (top function words; the test corpus
# is synthetic so any fixed list exercises the ratio machinery).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

_WS = r"\s+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization -> array<string> (JVM split, no UDF)."""
    return F.split(F.trim(col), _WS)


def token_count(col: Column) -> Column:
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col)))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-approximating token count: word-piece regex + length/4 heuristic.

    Counts regex word pieces (letters runs, digit runs, punctuation chars)
    — the standard cheap proxy for LLM tokenizer counts when the real
    tokenizer is unavailable on the cluster.
    """
    pieces = F.regexp_extract_all(col, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    # long words tokenize to ~ceil(len/4) BPE pieces
    return F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, w: acc + F.greatest(F.lit(1), F.ceil(F.length(w) / 4).cast("int")),
    )


def avg_token_len(col: Column) -> Column:
    t = tokens(col)
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
        F.aggregate(t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
        / F.size(t)
    )


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation."""
    n = F.length(col)
    npunct = n - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(npunct / n)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS)])
    t = tokens(F.lower(col))
    counted = F.aggregate(
        t,
        F.lit(0),
        lambda acc, w: acc + F.when(F.array_contains(sw, w), 1).otherwise(0),
    )
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(counted / F.size(t))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + punct + stopwords.

    Mirrors the shape of public quality filters (C4/Gopher rules): documents
    that are too short, all-punctuation, or stopword-free score low.
    """
    ntok = token_count(col)
    len_score = F.least(ntok / 100.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4)
    sw = stopword_ratio(col)
    sw_score = F.when(sw > 0.6, F.lit(0.4)).when(sw > 0, F.lit(1.0)).otherwise(F.lit(0.7))
    return F.round(len_score * 0.5 + punct_pen * 0.3 + sw_score * 0.2, 6)


def fingerprint(col: Column, head: int = 500) -> Column:
    """Order-sensitive document fingerprint: ``md5`` of the first ``head``
    characters (lowercase hex).

    Earlier formulations (regex word-split in r4, per-codepoint positional
    sums in r5) were each environment-sensitive at the external gate:
    Java-regex ``\\s`` and RE2 ``\\s`` disagree on e.g. ``\\x0B``, and older
    Spark ``ascii()`` returns the first UTF-8 *byte* for non-ASCII while
    DuckDB's ``unicode()`` returns the codepoint.  md5-of-head sidesteps
    all per-character arithmetic: identical input bytes produce identical
    hex in every Spark and DuckDB version.  The head window keeps the
    fingerprint a cheap order-sensitive candidate key for dedup (what
    ``fingerprint_dedup`` needs); NULL stays NULL, empty text hashes to
    md5("").
    """
    return F.md5(F.substring(col, 1, head))


# ---------------------------------------------------------------- language-ID

# Character-bigram profiles per language (tiny, deterministic; real systems
# ship fasttext — the plumbing is what matters: one Arrow batch per task).
_LANG_PROFILES = {
    "en": ["th", "he", "in", "er", "an", "on", "at", "en", "nd", "ti"],
    "de": ["en", "er", "ch", "de", "ei", "te", "in", "nd", "ie", "ge"],
    "fr": ["es", "le", "de", "en", "on", "nt", "re", "ou", "ur", "an"],
    "es": ["de", "en", "el", "la", "os", "es", "ar", "ue", "ra", "as"],
    "zh": [],  # CJK detected by codepoint range instead
}


@F.pandas_udf(T.StringType())
def detect_language(texts: pd.Series) -> pd.Series:
    """N-gram-heuristic language ID (pandas UDF, Arrow-batched)."""

    def detect(text):
        if not text:
            return None
        cjk = sum(1 for c in text[:200] if "一" <= c <= "鿿")
        if cjk > len(text[:200]) * 0.2:
            return "zh"
        sample = text[:500].lower()
        bigrams = [sample[i:i + 2] for i in range(len(sample) - 1)]
        if not bigrams:
            return None
        best, best_score = None, -1.0
        for lang, profile in _LANG_PROFILES.items():
            if not profile:
                continue
            score = sum(bigrams.count(bg) for bg in profile) / len(bigrams)
            if score > best_score:
                best, best_score = lang, score
        return best

    return texts.map(detect)


# ------------------------------------------------------- pkg-string heuristic

# returnType as a StructType OBJECT: a DDL string here would require an
# active SparkContext at import time (module-level decorator)
_PKG_SPLIT_SCHEMA = T.StructType(
    [T.StructField("name", T.StringType()), T.StructField("version", T.StringType())]
)


@F.pandas_udf(_PKG_SPLIT_SCHEMA)
def split_pkg_string(pkgs: pd.Series) -> pd.DataFrame:
    """E7/F6 package-string heuristic split (reference semantics:
    providers/rhel/parser.py:394-438 — epoch-position disambiguation).

    'name-epoch:ver-rel' | 'name-ver-rel' | 'name' -> (name, version).
    Branchy positional logic -> a single Arrow-batched UDF, applied once
    per row in a projection (never per comparison).
    """

    def split(s):
        if s is None:
            return (None, None)
        if ":" in s:
            # epoch present: name is everything before the dash preceding epoch
            head, _, tail = s.partition(":")
            name, dash, epoch = head.rpartition("-")
            if dash:
                return (name, f"{epoch}:{tail}")
            return (head, tail)
        parts = s.rsplit("-", 2)
        if len(parts) == 3 and parts[1][:1].isdigit():
            return (parts[0], f"{parts[1]}-{parts[2]}")
        if len(parts) >= 2 and parts[-1][:1].isdigit():
            return ("-".join(parts[:-1]), parts[-1])
        return (s, None)

    import pandas as pd  # noqa: F811

    out = [split(v) for v in pkgs]
    return pd.DataFrame(out, columns=["name", "version"])


@F.pandas_udf(T.StringType())
def nfc_normalize(texts: pd.Series) -> pd.Series:
    """Unicode NFC normalization (pandas UDF, Arrow-batched) — the
    canonical-composition pass every text pipeline needs before hashing
    or deduplicating: decomposed e+COMBINING ACUTE, compatibility
    singletons (ANGSTROM SIGN -> Å), and Hangul jamo sequences all
    compose, so byte-identical content gets byte-identical keys.
    Python's unicodedata implements the same Unicode NFC the SQL
    engines expose (x25 pins DuckDB nfc_normalize parity by value)."""
    import unicodedata

    return texts.map(
        lambda s: unicodedata.normalize("NFC", s) if s is not None else None
    )
