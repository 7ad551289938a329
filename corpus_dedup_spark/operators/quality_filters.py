"""Reference-pipeline quality filters: C4 line rules and Gopher document rules.

Two of the canonical web-text cleaning stages (both public):

- **C4** (Raffel et al. 2020, §2.2): keep only lines that end in terminal
  punctuation, contain ≥ 3 words, and don't mention javascript; drop pages
  containing "lorem ipsum" or a curly brace, or with fewer than 5 surviving
  lines. (C4 counts sentences for the ≥5 rule; this implementation counts
  surviving lines — the common open reimplementation — and documents it.)
- **Gopher** (Rae et al. 2021, A1.1): doc-level thresholds on word count,
  mean word length, symbol-to-word ratio, bullet/ellipsis line shares,
  alphabetic-word share, and stop-word presence.

Everything is whole-stage-codegen JVM expressions over split arrays — one
map pass per document, no shuffle, no Python. Every threshold is evaluated
in INTEGER arithmetic (e.g. mean-word-length ∈ [3,10] as
``3·n_words ≤ Σlen ∧ Σlen ≤ 10·n_words``), so the flags are bit-exact across
engines and the DuckDB oracles replay them with zero float drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's "required stop words" list (Rae et al. 2021, A1.1); a doc must
# contain ≥ 2 of them as exact (lowercased) tokens
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_TERMINAL = (".", "!", "?", '"')
_BULLETS = ("•", "-", "*")


def _words(text: Column) -> Column:
    """Non-empty whitespace tokens (same split the quality_scores oracle uses)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != F.lit(""))


def _lines(text: Column) -> Column:
    return F.split(text, "\n")


def _c4_line_keep(l: Column) -> Column:
    wc = F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda x: x != F.lit("")))
    terminal = F.substring(F.rtrim(l), -1, 1).isin(*_TERMINAL)
    return (wc >= 3) & terminal & ~F.lower(l).contains("javascript")


def c4_line_filter(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, n_lines, n_kept, page_kept, clean_text): C4 cleaning, per document.

    ``clean_text`` is the line-filtered text regardless of the page verdict
    (so the caller can inspect rejects); ``page_kept`` carries the page-level
    decision. Every document appears in the output — filtering is the
    caller's ``WHERE page_kept = 1``.
    """
    # Two-stage select: the kept-lines array is a non-cheap higher-order
    # expression referenced three times downstream — materializing it as an
    # intermediate column stops CollapseProject from inlining (and therefore
    # re-evaluating) it per consumer. One filter pass per document.
    staged = docs.select(
        id_col,
        F.col(text_col).alias("_text"),
        _lines(F.col(text_col)).alias("_lines"),
        F.filter(_lines(F.col(text_col)), _c4_line_keep).alias("_kept"),
    )
    n_kept = F.size("_kept")
    page = (
        ~F.lower(F.col("_text")).contains("lorem ipsum")
        & ~F.col("_text").contains("{")
        & (n_kept >= 5)
    )
    return staged.select(
        id_col,
        F.size("_lines").cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        page.cast("long").alias("page_kept"),
        F.array_join("_kept", "\n").alias("clean_text"),
    )


def _count_occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via replace — engine-portable."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) \
        / F.lit(len(needle))


def gopher_quality_flags(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Gopher A1.1 quality rules as per-document counters + integer flags.

    Thresholds (all evaluated in integer arithmetic):
      wc_ok       50 ≤ n_words ≤ 100 000
      mwl_ok      3 ≤ mean word length ≤ 10   (3n ≤ Σlen ∧ Σlen ≤ 10n)
      sym_ok      (#'#' + #'...') / n_words ≤ 0.1   (10·n_sym ≤ n_words)
      bullet_ok   ≤ 90% of lines start with a bullet (10·n_bullet ≤ 9·n_lines)
      ellipsis_ok ≤ 30% of lines end with an ellipsis (10·n_ell ≤ 3·n_lines)
      alpha_ok    ≥ 80% of words contain an alphabetic char (5·n_alpha ≥ 4·n)
      stop_ok     ≥ 2 of the 8 required stop words present as exact tokens
      gopher_pass all of the above
    """
    # Same two-stage shape as c4_line_filter: words/lines arrays are each
    # referenced by several flag expressions — stage them once per row.
    docs = docs.select(
        id_col,
        F.col(text_col).alias("_text"),
        _words(F.col(text_col)).alias("_words"),
        _lines(F.col(text_col)).alias("_lines"),
    )
    text = F.col("_text")
    words = F.col("_words")
    lines = F.col("_lines")
    n_words = F.size(words)
    n_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    n_sym = (
        _count_occurrences(text, "#") + _count_occurrences(text, "...")
    ).cast("long")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines, lambda l: F.substring(F.ltrim(l), 1, 1).isin(*_BULLETS)))
    n_ellipsis = F.size(F.filter(
        lines, lambda l: F.endswith(F.rtrim(l), F.lit("..."))
        | F.endswith(F.rtrim(l), F.lit("…"))))
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[a-zA-Z]")))
    wl = F.transform(words, F.lower)
    n_stop = sum(
        (F.array_contains(wl, w).cast("long") for w in GOPHER_STOP_WORDS),
        F.lit(0).cast("long"),
    )

    flags = {
        "wc_ok": (n_words >= 50) & (n_words <= 100_000),
        "mwl_ok": (3 * n_words <= n_word_chars)
        & (n_word_chars <= 10 * n_words),
        "sym_ok": 10 * n_sym <= n_words,
        "bullet_ok": 10 * n_bullet <= 9 * n_lines,
        "ellipsis_ok": 10 * n_ellipsis <= 3 * n_lines,
        "alpha_ok": 5 * n_alpha >= 4 * n_words,
        "stop_ok": n_stop >= 2,
    }
    gopher_pass = None
    for c in flags.values():
        gopher_pass = c if gopher_pass is None else (gopher_pass & c)
    return docs.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        n_word_chars.cast("long").alias("n_word_chars"),
        n_sym.alias("n_sym"),
        n_lines.cast("long").alias("n_lines"),
        n_bullet.cast("long").alias("n_bullet"),
        n_ellipsis.cast("long").alias("n_ellipsis"),
        n_alpha.cast("long").alias("n_alpha"),
        n_stop.cast("long").alias("n_stop"),
        *[v.cast("long").alias(k) for k, v in flags.items()],
        gopher_pass.cast("long").alias("gopher_pass"),
    )
