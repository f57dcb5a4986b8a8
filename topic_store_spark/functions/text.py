"""Text analysis built-ins: tokenization, shingling, language ID, quality.

All JVM-side expressions (no UDFs).  Tokenization and counting are
defined identically to their DuckDB-SQL equivalents so the operators
built on top are oracle-checkable:

- tokens      = non-empty pieces of regexp-split on ``\\s+`` of trimmed text
- shingles    = space-joined n-grams of tokens (word) / substrings (char)
- language_id = stopword-hit scoring with a fixed tie-break order
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# per-language stopword alternations (word-boundary anchored, lowercase)
LANG_STOPWORDS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|you|that|it|for|on|with|as|are)\b",
    "es": r"\b(el|la|de|que|y|los|del|las|un|por|con|una|es|para)\b",
    "de": r"\b(der|die|und|das|ist|von|mit|den|im|ein|eine|nicht|auf)\b",
    "fr": r"\b(le|la|les|de|des|et|est|un|une|du|que|pour|dans|qui)\b",
}
# CJK detection uses a literal character range (portable across Java/RE2)
CJK_PATTERN = "[一-龥]"

LANG_PRIORITY = ("en", "es", "de", "fr", "zh")


def normalize_text(col: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed (BPE-ish splitting lives in
    ``token_count``'s regex variant)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def shingles_from_tokens(tk: Column, n: int = 3) -> Column:
    """Space-joined word n-grams from a *materialized* token-array column.

    IMPORTANT perf contract: ``tk`` must be a plain attribute (a column
    produced by a previous ``select``), not an inline expression.  The
    lambda below references ``tk`` once per array element; higher-order
    functions are interpreted (not codegen'd) and get no subexpression
    elimination, so an inline ``tokens(text)`` here would re-run the regex
    split O(len) times per row.  Staging through a projection keeps it to
    one evaluation — CollapseProject never inlines non-cheap expressions
    referenced more than once.
    """
    shingled = F.transform(
        F.sequence(F.lit(1), F.size(tk) - (n - 1)),
        lambda i: F.array_join(F.slice(tk, i, n), " "),
    )
    return F.when(F.size(tk) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Space-joined word n-grams; fewer than n tokens -> empty array.

    Convenience single-expression form.  In operators prefer
    ``select(tokens(..).alias("tk"))`` + ``shingles_from_tokens`` (see the
    perf contract there).
    """
    return shingles_from_tokens(tokens(col), n)


def char_shingles_from_norm(txt: Column, n: int = 5) -> Column:
    """Character n-grams from a *materialized* normalized-text column
    (same perf contract as shingles_from_tokens: pass an attribute, not
    an inline normalize_text expression — the lambda evaluates its body
    per character position)."""
    shingled = F.transform(
        F.sequence(F.lit(1), F.length(txt) - (n - 1)),
        lambda i: F.substring(txt, i, n),
    )
    return F.when(F.length(txt) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(col: Column, n: int = 5) -> Column:
    """Character n-grams over normalized text (convenience form)."""
    return char_shingles_from_norm(normalize_text(col), n)


#: BPE-ish pre-tokenization: letter runs, single digits, punctuation runs —
#: the same character-class split GPT-2-style tokenizers apply before BPE
#: merges.  Identical regex semantics in Java and DuckDB (pure classes).
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer split (vs whitespace
    ``token_count``)."""
    return F.regexp_count(col, F.lit(BPE_SPLIT_PATTERN))


def _stopword_hits(col: Column, pattern: str) -> Column:
    return F.regexp_count(F.lower(col), F.lit(pattern))


def language_scores(col: Column) -> dict[str, Column]:
    scores = {
        lang: _stopword_hits(col, pat) for lang, pat in LANG_STOPWORDS.items()
    }
    scores["zh"] = F.regexp_count(col, F.lit(CJK_PATTERN))
    return scores


def language_id(col: Column) -> Column:
    """n-gram/stopword-heuristic language guess with deterministic
    tie-break (priority order en > es > de > fr > zh); no hits -> 'und'."""
    scores = language_scores(col)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(out)


def quality_features(col: Column) -> dict[str, Column]:
    """Length/punctuation/stopword-ratio quality signals.  All ratios are
    double divisions of exact integers — deterministic across engines.
    ``try_divide``, not ``/``: an empty document makes the denominator 0,
    which must be NULL (DuckDB's x/0), not a query-killing ANSI error —
    one empty doc in a 100 TB corpus must not fail the scan."""
    n_chars = F.length(col)
    n_tok = token_count(col)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": F.try_divide(
            F.length(F.regexp_replace(F.trim(col), r"\s+", "")), n_tok
        ),
        "punct_ratio": F.try_divide(
            F.regexp_count(col, F.lit(r"[\.,;:!\?]")), n_chars
        ),
        "alpha_ratio": F.try_divide(
            F.regexp_count(col, F.lit("[a-zA-Z]")), n_chars
        ),
        "stopword_ratio": F.try_divide(
            _stopword_hits(col, LANG_STOPWORDS["en"]), n_tok
        ),
    }


# ---------------------------------------------------------------------------
# Intra-document repetition (the Gopher-rules family: Rae et al. 2021,
# "Scaling Language Models", appendix A1.1 — the same repetition filters
# RefinedWeb/Dolma/DataTrove apply before pretraining).  Everything here
# is MAP-SIDE: the statistics are per-document, so they compile to
# array_sort + one linear aggregate pass per row — zero corpus shuffles.
# The explode + doc-keyed groupBy formulation shuffles ~one row per
# TOKEN of the corpus; at 100 TB that shuffle IS the query.
# ---------------------------------------------------------------------------

#: symbols whose density flags machine-generated / boilerplate text
#: (Gopher's symbol-to-word ratio counts '#' and ellipses).  Alternatives
#: start with distinct characters, so Java (leftmost-first) and RE2
#: (leftmost-longest) pick identical non-overlapping matches.
SYMBOL_PATTERN = r"#|\.\.\.|…"
#: a trimmed line opening with a bullet glyph
BULLET_LINE_PATTERN = r"^[-*•]"
#: a trimmed line ending in an ASCII or Unicode ellipsis.  \z, not $:
#: Java's bare $ also matches just before a FINAL line terminator
#: (a trailing \r from a lone-CR document would slip through), RE2's
#: does not; \z means end-of-input in both engines.
ELLIPSIS_LINE_PATTERN = "(\\.\\.\\.|…)\\z"


def line_array(col: Column) -> Column:
    """Non-empty trimmed lines of a document (``\\r?\\n``-separated —
    CRLF corpora split identically in Java and RE2).  The unit the
    Gopher duplicate-line / bullet / ellipsis fractions are defined
    over."""
    # NB: the lambda must be explicitly unary — F.transform passes a
    # second (index) argument to any callable that accepts one, and
    # F.trim's optional second parameter silently absorbs it as the
    # trim-character set (no trim happens at all)
    return F.filter(
        F.transform(F.split(col, r"\r?\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def sorted_run_stats(sorted_arr: Column) -> Column:
    """Run-length statistics over a *pre-sorted, materialized* string
    array column, in ONE linear aggregate pass:

    - ``n_distinct``: number of distinct values (run starts — saves a
      separate O(n) ``array_distinct`` traversal per consumer)
    - ``top_freq``:  multiplicity of the most frequent value
    - ``top_chars``: max over values of ``multiplicity * length(value)``
      (characters covered by occurrences of a single repeated value)
    - ``dup_chars``: sum over values with multiplicity > 1 of
      ``multiplicity * length(value)`` (characters inside duplicates)
    - ``tot_chars``: sum of ``length(value)`` over all elements

    All longs; an empty array yields all zeros.  The caller sorts once
    (``F.array_sort``) and stages both the sorted array and this struct
    through ``select`` projections — the same attribute contract as
    ``shingles_from_tokens`` (higher-order lambdas get no subexpression
    elimination).  Equality grouping only needs *a* total order, so the
    binary UTF8 sort is fine.
    """
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("n_distinct"),
        zero.alias("top_freq"),
        zero.alias("top_chars"),
        zero.alias("dup_chars"),
        zero.alias("tot_chars"),
    )

    def merge(acc: Column, x: Column) -> Column:
        ln = F.length(x).cast("long")
        run = (
            F.when((acc["run"] > 0) & (x == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        # when a run reaches 2 the FIRST occurrence retroactively counts
        # as duplicated too, hence the 2*ln step
        dup = acc["dup_chars"] + (
            F.when(run == 2, ln * 2).when(run > 2, ln).otherwise(zero)
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (acc["n_distinct"] + F.when(run == 1, 1).otherwise(0))
            .alias("n_distinct"),
            F.greatest(acc["top_freq"], run).alias("top_freq"),
            F.greatest(acc["top_chars"], run * ln).alias("top_chars"),
            dup.alias("dup_chars"),
            (acc["tot_chars"] + ln).alias("tot_chars"),
        )

    return F.aggregate(sorted_arr, init, merge)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards alpha density and
    reasonable token lengths, penalizes punctuation soup."""
    f = quality_features(col)
    length_ok = F.when((f["n_tokens"] >= 5) & (f["n_chars"] >= 30), 1.0).otherwise(0.0)
    return (
        0.4 * f["alpha_ratio"]
        + 0.3 * length_ok
        + 0.3 * (1.0 - F.least(f["punct_ratio"] * 5.0, F.lit(1.0)))
    )


# ---------------------------------------------------------------------------
# PII redaction (corpus-curation step before training-data release).
# Patterns are deliberately alternation-free so Java regex (Spark,
# leftmost-first) and RE2 (DuckDB oracle, leftmost-longest) match the
# same spans; greedy character-class quantifiers agree in both.
# ---------------------------------------------------------------------------

#: (pattern, replacement) — applied in order; order matters (emails are
#: redacted before phone digit-runs could eat their numeric fragments).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # Phone: optional +country-code, then a NANP-shaped 3-3-(2..4) digit
    # body with at most one separator between groups.  The \b after the
    # optional "(" forces the country-code group to be separator-delimited,
    # so ISO dates ("2026-08-13": runs of 4-2-2) and digit runs >13 chars
    # (IDs, card numbers) can never satisfy the group structure + trailing
    # \b — the old [\d() .-]{7,} run matched both.  Alternation-free.
    (r"\+?(?:\d{1,3}[ .-])?\(?\b\d{3}\)?[ .-]?\d{3}[ .-]?\d{2,4}\b", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Mask emails, IPv4 addresses, and phone-shaped digit runs — the
    text-corpus analog of the reference's credential masking
    (reference convert.py:254-259 redacts `user:pass@` URIs; training
    corpora redact person-contact strings).  Pure JVM regexp_replace
    chain: codegen-covered, no Python in the hot path."""
    out = col
    for pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-document hit counts for each PII class (audit signal)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[0][0]), 0)),
        "n_ips": F.size(F.regexp_extract_all(col, F.lit(PII_PATTERNS[1][0]), 0)),
    }
