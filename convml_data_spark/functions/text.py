"""Text-analysis expressions for LLM-training-data pipelines.

These extend the reference's surface (BASELINE.json north star): language-ID
heuristics, quality scoring, token counting, shingling for dedup. All pure
Column expressions (JVM regex engine, whole-stage codegen) — the 100 TB hot
path never enters Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: word runs or single non-word-non-space marks.
# Whitespace spelled as the explicit ASCII class (== Java's \s exactly,
# so Spark behavior is unchanged): RE2's \s excludes \x0B, and the
# DuckDB twin of this pattern must tokenize \x0B-bearing text the same.
TOKEN_PATTERN = r"\w+|[^\w \t\n\x0B\f\r]"

# GPT-2-style byte-pair pre-tokenizer, restricted to the RE2∩Java regex
# subset (no lookahead, ASCII classes): contraction suffixes, then
# space-prefixed letter runs / digit runs / punctuation runs, then residual
# whitespace. Both engines use leftmost-first alternation, so piece COUNTS
# agree exactly (the dropped `\s+(?!\S)` branch only re-segments runs of
# blanks, which the count is insensitive to for single-space text).
# Whitespace is the EXPLICIT class [ \t\n\x0B\f\r] (Java's ASCII \s), not
# the metaclass: RE2's \s excludes vertical tab \x0B, so `\s` would make
# the two dialects pre-tokenize \x0B-bearing text differently.
BPE_PIECE_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^A-Za-z0-9 \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+"
)

# Tiny high-frequency English function-word list for the language-ID
# heuristic (stopword-ratio); deterministic and oracle-expressible.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty strings filtered); NULL text tokenizes to
    the EMPTY array, not NULL.

    The coalesce is the single choke point that makes every downstream
    ``F.size``/ratio/guard conf-independent: ``size(NULL)`` is NULL under
    default/ANSI sessions but **-1** when a session sets
    ``spark.sql.ansi.enabled`` explicitly false (legacy.sizeOfNull), so a
    NULL-propagating tokenizer would give NULL-text docs session-dependent
    metrics. An empty doc and a NULL doc tokenize identically — the
    semantics every consumer here already assumed."""
    return F.coalesce(
        F.filter(
            # explicit ASCII whitespace class == Java \s (Spark output
            # unchanged); RE2's \s excludes \x0B, so the 60+ DuckDB
            # string_split_regex twins use this same spelling
            F.split(text, r"[ \t\n\x0B\f\r]+"),
            lambda t: t != F.lit(""),
        ),
        F.array().cast("array<string>"),
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def _size0(arr: Column) -> Column:
    """size() with NULL arrays counting 0 — same conf-independence rule
    as tokens() (size(NULL) is NULL or -1 depending on how the session
    set spark.sql.ansi.enabled)."""
    return F.size(F.coalesce(arr, F.array().cast("array<string>")))


def regex_token_count(text: Column) -> Column:
    """BPE-ish regex token count (words + punctuation marks); NULL text
    counts 0."""
    return _size0(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)))


def bpe_piece_count(text: Column) -> Column:
    """GPT-2-style pre-tokenizer piece count (the unit LLM token budgets
    are phrased in). One JVM `regexp_count` per row — no Python, no
    explode; DuckDB replays as ``len(regexp_extract_all(...))``."""
    return F.regexp_count(text, F.lit(BPE_PIECE_PATTERN))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    stripped = F.regexp_replace(text, r"[^.,;:!?'\"()-]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def en_stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are English function words."""
    toks = tokens(F.lower(text))
    stop = F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    return F.size(stop) / F.greatest(F.size(toks), F.lit(1))


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Array of space-joined n-grams from a pre-materialized token array.

    Prefer this over :func:`word_ngrams` in operators: materialize the token
    array as a column first so the tokenizer runs once per row, not once per
    n-gram position.
    """
    k = F.size(toks) - (n - 1)
    # n shifted slices zipped once beats one slice PER POSITION (the
    # sequence+slice form): ~30% less expression work on real corpora,
    # identical output (verified element-for-element)
    shifted = [F.slice(toks, i + 1, F.greatest(k, F.lit(0))) for i in range(n)]
    z = F.arrays_zip(*shifted)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Array of word n-grams (space-joined), for Jaccard shingling."""
    return ngrams_from_tokens(tokens(F.lower(text)), n)


def char_ngrams(text: Column, n: int) -> Column:
    """Array of character n-grams."""
    k = F.length(text) - (n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), k), lambda i: F.substring(text, i, n))
    )


LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es": ("el", "los", "y", "es", "un", "una", "en", "que"),
}


def lang_stopword_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (n-gram-free language-ID heuristic).

    The token array is shared across languages via common subexpression
    elimination; each score is a JVM-side filter/size — no UDF."""
    toks = tokens(F.lower(text))
    denom = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))) / denom
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_guess(text: Column) -> Column:
    """Argmax language with a fixed priority order on ties (en>de>fr>es) —
    deterministic and replayable in any SQL engine as a CASE chain."""
    s = lang_stopword_scores(text)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]), F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def mean_word_len(toks: Column) -> Column:
    """Mean character length of the tokens (0.0 for empty docs)."""
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) <= 0, F.lit(0.0)).otherwise(
        total / F.size(toks)
    )


def top_ngram_frac(toks: Column, n: int) -> Column:
    """Fraction of n-gram occurrences taken by the single most frequent
    n-gram — the Gopher-style repetition signal (Rae et al. 2021, "Scaling
    Language Models", table A1 uses the top-2-gram character fraction; we
    use the occurrence fraction, engine-defined).

    In-row array math, O(g log g) per row: the max multiplicity is the
    longest run of equal adjacent elements in the SORTED n-gram array
    (one array_sort + one linear fold) — value-identical to the former
    per-distinct occurrence scan (transform(array_distinct(g), count))
    but never quadratic in document length (the old form was O(d·g):
    ~4M comparisons for a 2k-token doc vs ~22k here, and the Gopher
    gates run it for up to three n values per row). No explode, no
    shuffle, codegen-friendly at 100 TB. Returns 0.0 for docs shorter
    than n tokens.
    """
    g = ngrams_from_tokens(toks, n)
    gs = F.array_sort(g)
    # fold state (prev, run, best): run = length of the current equal
    # run, best = max run so far. n-grams are never NULL (concat_ws over
    # non-null tokens), so prev IS NULL marks only the first element.
    st = F.aggregate(
        gs,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return F.when(F.size(g) <= 0, F.lit(0.0)).otherwise(
        st["best"] / F.size(g)
    )


def dup_frac(arr: Column) -> Column:
    """Fraction of array elements that are repeats of an earlier one:
    ``1 - distinct/total`` (0.0 for empty or NULL arrays — the
    conf-independent guard, see :func:`tokens`)."""
    a = F.coalesce(arr, F.array().cast("array<string>"))
    return F.when(F.size(a) <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(a)) / F.size(a)
    )


def dup_ngram_frac(toks: Column, n: int) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier one:
    ``1 - distinct/total`` (0.0 for docs shorter than n tokens)."""
    return dup_frac(ngrams_from_tokens(toks, n))


# PII patterns chosen for identical semantics in Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3,4}-?\d{0,4}\b"


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in ``text`` — JVM regex, no UDF; NULL
    text counts 0 of each (conf-independent, see _size0)."""
    n_email = _size0(F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0)))
    n_phone = _size0(F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0)))
    return n_email, n_phone


def redact_pii(text: Column) -> Column:
    """Replace every email / phone match with a typed placeholder token
    (the scrubbing pass an LLM-corpus pipeline runs before training)."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def kgram_hashes(text: Column, k: int = 8) -> Column:
    """Per-position k-gram 52-bit hashes (document fingerprinting).

    The sliding window stays an in-row ARRAY (no explode): min / distinct
    reductions happen with array expressions, so fingerprinting is one
    narrow projection — no shuffle, no row blow-up at 100 TB.
    """
    return F.transform(
        char_ngrams(text, k),
        lambda g: F.conv(F.substring(F.md5(g), 1, 13), 16, 10).cast("long"),
    )


def winnow_select(hashes: Column, w: int = 4) -> Column:
    """Winnowing selection (Schleimer et al. 2003, "Winnowing: Local
    Algorithms for Document Fingerprinting", SIGMOD): over a
    per-position hash array, slide a ``w``-hash window and select each
    window's minimum, ties to the RIGHTMOST occurrence. Note this
    rightmost-min tie rule is a DETERMINISTIC SIMPLIFICATION of the
    paper's "robust winnowing" — the paper prefers the PREVIOUS
    window's selection on ties, which is stateful across windows;
    rightmost-always re-selects a new position per window over runs of
    equal hashes, so this variant is DENSER on repetitive text (and
    identical elsewhere, since a unique minimum has no ties). Both
    rules keep the guarantee that matters: any two documents sharing a
    substring of length ≥ w + k − 1 (k = the n-gram width behind
    ``hashes``) share at least one selected fingerprint — the
    local-match property MOSS builds on, and the gap shingle-set dedup
    leaves for partial overlaps.

    Returns the DISTINCT selected ``(pos, fp)`` structs as an in-row
    array: no explode, no shuffle — selection is a transform over
    window starts with a constant-``w`` fold per window. Pass a COLUMN
    REFERENCE (project :func:`kgram_hashes` first), not the raw
    expression: each of the fold's array lookups embeds its input
    subtree, so an inline expression would re-derive the hash array
    per reference.
    """
    n = F.greatest(F.size(hashes), F.lit(0))
    starts = F.when(
        n >= w, F.sequence(F.lit(0), n - F.lit(int(w)))
    ).otherwise(F.array().cast("array<int>"))
    pick = F.transform(
        starts,
        lambda i: F.aggregate(
            F.sequence(i + 1, i + F.lit(int(w))),  # 1-based positions
            F.struct(
                F.lit(-1).cast("int").alias("pos"),
                F.lit(None).cast("long").alias("fp"),
            ),
            lambda acc, j: F.when(
                acc["fp"].isNull()
                | (F.element_at(hashes, j.cast("int")) <= acc["fp"]),
                F.struct(
                    (j - 1).cast("int").alias("pos"),
                    F.element_at(hashes, j.cast("int")).alias("fp"),
                ),
            ).otherwise(acc),
        ),
    )
    return F.array_distinct(pick)
