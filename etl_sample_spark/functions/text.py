"""Text-analysis column functions (SURVEY §2.12 L4; driver north_star).

All pure Catalyst expressions (split / higher-order array functions) so
they run JVM-side at 100 TB — no Python in the hot path. Definitions are
deliberately engine-portable (same arithmetic is expressible in ANSI SQL)
so the DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny embedded stopword list: enough for ratio features on the synthetic
# corpus; a production deployment would broadcast a real per-language list.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

FINGERPRINT_MOD = 1_000_000_007


def tokens(text: Column) -> Column:
    """SINGLE-SPACE tokenization → array<string> — deliberately the
    literal ' ' split, not a \\s+ regex: this is the corpus's canonical
    tokenizer and every DuckDB oracle twin splits with the identical
    STRING_SPLIT(text, ' '), so the two engines must agree token-for-
    token (runs of spaces yield empty tokens on BOTH sides). Changing
    to regex-whitespace would require changing every oracle in the
    same commit (r11 review: the old docstring claimed 'whitespace',
    which this is not)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return n_stop / F.size(toks)


def repetition_ratio(
    text: Column, n: int = 3, shingles: Column | None = None
) -> Column:
    """Gopher-style repetition signal: fraction of n-token shingles that
    are duplicates of an earlier shingle in the SAME document —
    boilerplate/spam text repeats itself, natural text mostly doesn't.

    Entirely map-side (array higher-order functions; no explode, no
    shuffle): at 100 TB this is a free gate in the same pass as the
    other quality signals. Docs with < n tokens score 0.0.

    INVARIANT (r16 ADVICE): a caller-supplied ``shingles`` column must
    have been built by ``_shingles(text, n)`` with the SAME ``n`` —
    this function cannot verify it, and a mismatched pair produces a
    wrong-but-plausible ratio. When ``shingles`` is passed, ``n`` is
    unused by construction.
    """
    from etl_sample_spark.operators.dedup import _shingles

    # `sh` is referenced three times below; as a bare expression each
    # reference re-built the whole shingle array (no CSE across
    # expression branches — r16). Callers that can stage the array as a
    # real column should pass it via ``shingles=`` (see
    # text_repetition_ratio); this expression-level form remains for
    # single-use composition into other map-side gates.
    sh = _shingles(text, n) if shingles is None else shingles
    return F.when(
        F.size(sh) > 0,
        1 - F.size(F.array_distinct(sh)) / F.size(sh),
    ).otherwise(F.lit(0.0))


def lang_id_heuristic(text: Column) -> Column:
    """N-gram-free language-ID heuristic: stopword density → 'en', tech
    jargon density → 'tech', else 'unknown'.

    A real deployment would use char-n-gram profiles per language; the
    point here is the *shape* — a deterministic, JVM-side classifier
    column — which is what scales.
    """
    toks = tokens(text)
    n = F.size(toks)
    stop_r = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n
    tech_r = F.size(F.filter(toks, lambda t: t.isin("spark", "vector", "hash", "query"))) / n
    return (
        F.when(stop_r > F.lit(0.08), "en")
        .when(tech_r > F.lit(0.12), "tech")
        .otherwise("unknown")
    )


def quality_score(text: Column, n_chars: Column) -> Column:
    """Document quality in [0,1]: length saturation + non-stopword mass.

    Mirrors the standard pretraining-data quality heuristics
    (length / punctuation / stopword ratios) in pure SQL arithmetic.
    """
    length_score = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    # Unrounded: every term is an exact integer ratio, so both engines
    # produce the identical double; ROUND would diverge (HALF_UP vs
    # HALF_EVEN) when the exact rational lands on a rounding boundary.
    return length_score * 0.5 + (1.0 - stopword_ratio(text)) * 0.5


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: position-weighted token hash
    mod a large prime (a rolling-hash analog that is portable across
    engines — no engine-specific hash function).

    fingerprint = sum_i (i+1) * (131*len(tok_i) + ascii(tok_i)) mod p
    """
    toks = tokens(text)
    terms = F.transform(
        toks,
        # length cast to bigint BEFORE the multiply: a single giant
        # token (minified/no-space text) over ~16.4M chars overflows
        # the int32 product — ANSI throws, non-ANSI silently wraps
        # (r11 review)
        lambda t, i: (i + F.lit(1)).cast("bigint") * (F.length(t).cast("bigint") * 131 + F.ascii(t)),
    )
    total = F.aggregate(terms, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return (total % FINGERPRINT_MOD).alias("fingerprint")


# PII patterns kept to the regex subset shared by Java regex (Spark) and
# RE2 (DuckDB): char classes + bounded repetition, no backreferences or
# lookaround, so the cross-engine oracle can reproduce the redaction
# exactly.
EMAIL_PATTERN = r"[a-zA-Z0-9._]+@[a-zA-Z0-9.]+\.[a-zA-Z][a-zA-Z]+"
# optional area-code prefix (r11 review: the bare ddd-dddd form left
# '555-' of a 10-digit number unredacted); (?:...) is in the shared
# Java/RE2 subset.
PHONE_PATTERN = r"(?:[0-9][0-9][0-9]-)?[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"


def redact_pii(text: Column) -> Column:
    """Redact email addresses and phone-shaped numbers: the standard
    training-corpus scrub, pure Catalyst ``regexp_replace`` — map-only,
    no Python, safe at any scale."""
    red = F.regexp_replace(text, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(red, PHONE_PATTERN, "<PHONE>")
