"""Text-analysis functions for large-scale training-data pipelines.

All pure column expressions (JVM-side, codegen) — at 100 TB these run in
the scan stage with zero shuffle.  Hash functions are deterministic integer
arithmetic (31-polynomial over char codes) so the DuckDB oracle can compute
byte-identical values (Spark's murmur hash is not portable across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# top stopwords per language for the n-gram/stopword language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den"],
    "fr": ["le", "la", "les", "et", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "por"],
}

MASK31 = (1 << 31) - 1


def tokens(text: Column) -> Column:
    """Lower-cased word tokens (BPE-ish regex split: runs of non-word chars
    are separators; empties dropped)."""
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9']+"), lambda t: t != ""
    )


_TOKEN_RE = __import__("re").compile(r"[^a-z0-9']+")


def tokens_py(text: str) -> list[str]:
    """Plain-Python twin of :func:`tokens` (same lower + split regex) for
    executor-side kernels that build fixtures from text (e.g. the ID3
    tag builder) — keeps the engine and its oracles on one tokenizer."""
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def token_count(text: Column) -> Column:
    """Whitespace-regex token count."""
    return F.size(tokens(text))


def char_poly_hash(s: Column) -> Column:
    """Deterministic 31-polynomial hash of a string's char codes, mod 2^31.

    Portable across Spark and DuckDB (both compute the same integer):
    ``h = (h*31 + ascii(ch)) & (2^31-1)``.
    """
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(MASK31 + 1),
    ).cast("long")


def stopword_hits_from_tokens(toks: Column, lang: str) -> Column:
    """Count of stopword occurrences for one language, over a token array."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def stopword_hits(text: Column, lang: str) -> Column:
    return stopword_hits_from_tokens(tokens(text), lang)


def detect_language_from_tokens(toks: Column) -> Column:
    """Language-ID over a pre-materialized token array (cheap form — use
    this in pipelines: tokenization runs once, not once per language)."""
    hits = {lang: stopword_hits_from_tokens(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit(None).cast("string")
    # reverse order so earlier languages win ties (when-chain = first match)
    chain = None
    for lang in STOPWORDS:
        cond = (hits[lang] == best) & (best > 0)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return chain.otherwise(expr)


def detect_language(text: Column) -> Column:
    """Language-ID heuristic: the language with the most stopword hits;
    NULL when no language scores > 0.  Ties go to the earlier language in
    STOPWORDS order (first-match when chain)."""
    return detect_language_from_tokens(tokens(text))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: penalize extreme length, high punct
    ratio, low alpha ratio, low stopword ratio.  Deterministic arithmetic —
    oracle-expressible."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    nt = token_count(text)
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    len_ok = F.when((nt >= 5) & (nt <= 5000), F.lit(1.0)).otherwise(F.lit(0.5))
    return (
        (alpha_ratio * 0.5 + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.25 + len_ok * 0.25)
    ).cast("double")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: rolling 31-polynomial hash over the normalized
    token stream (deterministic, oracle-expressible)."""
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * 1000003
            + F.aggregate(
                F.split(t, ""),
                F.lit(0).cast("long"),
                lambda a, ch: (a * 31 + F.ascii(ch)) % F.lit(MASK31 + 1),
            )
        )
        % F.lit(MASK31 + 1),
    ).cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are common stopwords of ``lang`` (0 if no
    tokens), over the language-ID stopword lists above.  Gopher-style
    quality signal: natural prose sits well above ~0.03; token array
    bound once (see ``shingles``)."""
    words = STOPWORDS[lang]

    def _ratio(toks: Column) -> Column:
        nt = F.size(toks)
        ns = F.size(F.filter(toks, lambda t: t.isin(*words)))
        return F.when(nt > 0, ns / nt).otherwise(F.lit(0.0))

    return F.element_at(F.transform(F.array(tokens(text)), _ratio), 1).cast(
        "double"
    )


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Duplicate token-n-gram fraction: ``1 - distinct/total`` shingles
    (0 for docs shorter than one shingle).  Gopher-style quality signal:
    high values flag boilerplate/templated text; shingle array bound
    once (see ``shingles``)."""

    def _ratio(sh: Column) -> Column:
        tot = F.size(sh)
        return F.when(
            tot > 0, 1.0 - F.size(F.array_distinct(sh)) / tot
        ).otherwise(F.lit(0.0))

    return F.element_at(F.transform(F.array(shingles(text, n)), _ratio), 1).cast(
        "double"
    )


def normalize_text(text: Column) -> Column:
    """Canonical text form: lower-case, whitespace runs collapsed to one
    space, leading/trailing whitespace stripped.

    The whitespace class is written explicitly (``[ \\t\\n\\r]``) instead
    of ``\\s`` because Java regex and RE2 disagree on ``\\s`` (vertical
    tab) — this expression is reproduced verbatim in the DuckDB oracle.
    Pure column expression: runs in the scan stage, zero shuffle.
    """
    return F.trim(F.regexp_replace(F.lower(text), "[ \t\n\r]+", " "))


def redact(text: Column, pattern: str = "[0-9]+", replacement: str = "#") -> Column:
    """PII-style pattern redaction (digit runs by default — account
    numbers, phone numbers).  Keep patterns to the RE2 ∩ Java-regex
    common subset (explicit classes, no lookaround) so the DuckDB oracle
    computes the identical result."""
    return F.regexp_replace(text, pattern, replacement)


def shingles(text: Column, n: int = 3) -> Column:
    """Token n-gram shingles (space-joined), for Jaccard / MinHash.

    The token array is BOUND ONCE via an outer single-element
    ``transform`` before the per-position fan-out.  Higher-order
    functions run interpreted (outside codegen CSE), so a lambda that
    captured the ``tokens(text)`` EXPRESSION would re-tokenize the
    document once per shingle position — O(k²) work, measured 16 s vs
    0.6 s for one shingle pass over sf0.1.  As a lambda variable,
    ``toks`` is a cheap bound reference.  Shingle i is then built by
    zipping n staggered slices (3 slices total, not one per position)."""

    def _build(toks: Column) -> Column:
        k = F.size(toks)
        m = k - (n - 1)
        z = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
        return F.when(
            k >= n,
            F.transform(
                z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))

    return F.element_at(F.transform(F.array(tokens(text)), _build), 1)
