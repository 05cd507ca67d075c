"""Gopher/C4-style heuristic quality rules.

Spark side: ``fired_rules_expr`` — a pure ``pyspark.sql.functions``
expression evaluating every rule threshold in ONE pass per record
(JVM whole-stage-codegen).  This is the analog of the reference's
CASE-ladder tagging (SURVEY.md §2.7 U3 note: evaluate every rule per
record in one scan instead of 13 unioned scans, semantically equal to
proccess_data.sql:505-737 + the :734-736 rollup).  The stat INPUTS to
the thresholds come from the pipeline's single Arrow score pass
(wtq/pipeline.py), which calls ``py_stats`` below — the text is
already in Python for the regex scrub, so the O(words) dict pass is
far cheaper than re-evaluating interpreted higher-order expressions
per output column (measured in round 1: 176 → >10k docs/sec).

Oracle side: the differential oracle (oracle/oracle.py) calls the SAME
``py_stats`` while re-deriving keep/drop decisions independently of
the Spark plan.  The contract for every stat is documented once here.

Definitions (on the SCRUBBED text):
  words      = non-empty substrings after splitting on whitespace
               (Python ``str.split()`` semantics, incl. Unicode spaces)
  lines      = non-empty substrings after splitting on "\n"
  mean_word_len   = Σ len(word) / n_words          (0.0 if no words)
  symbol_ratio    = count(chars ∈ SYMBOLS) / max(n_words, 1)
  stopword_frac   = count(lower(word) ∈ STOPWORDS) / max(n_words, 1)
  bullet_frac     = count(line startswith bullet) / max(n_lines, 1)
  ellipsis_frac   = count(line endswith "...") / max(n_lines, 1)
  rep_line_frac   = Σ len(line)·(occurrences-1) over distinct lines
                    / Σ len(line)                (0.0 if no lines)
  top_word_frac   = max word frequency / n_words  (0.0 if no words)
  brace_line_frac = count(line contains "{" or "}") / max(n_lines, 1)
  has_lorem       = 1.0 iff lower(text) contains "lorem ipsum"
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column
from pyspark.sql import functions as F

from wtq.rules import registry as R
from wtq.rules.lexicon import STOPWORDS

def fired_rules_expr(
    stats: dict[str, Column],
    rep_line_frac: Column,
    top_word_frac: Column,
    lang_mismatch: Column,
    ppl: Column,
    profanity_hits: Column,
) -> Column:
    """array<string> of fired rule codes, sorted — the err_all analog
    (proccess_data.sql:814-841) built in ONE pass per record."""
    checks = [
        (stats["n_words"] < R.MIN_WORDS, "Q-1"),
        (stats["n_words"] > R.MAX_WORDS, "Q-2"),
        (
            (stats["n_words"] > 0)
            & (
                (stats["mean_word_len"] < R.MIN_MEAN_WORD_LEN)
                | (stats["mean_word_len"] > R.MAX_MEAN_WORD_LEN)
            ),
            "Q-3",
        ),
        (stats["symbol_ratio"] > R.SYMBOL_WORD_RATIO_MAX, "Q-4"),
        (stats["stopword_frac"] < R.STOPWORD_FRAC_MIN, "Q-6"),
        (rep_line_frac > R.REP_LINE_FRAC_MAX, "Q-7"),
        (stats["bullet_frac"] > R.BULLET_LINE_FRAC_MAX, "Q-8"),
        (stats["ellipsis_frac"] > R.ELLIPSIS_LINE_FRAC_MAX, "Q-9"),
        (top_word_frac > R.TOP_WORD_FRAC_MAX, "Q-10"),
        (stats["brace_line_frac"] > R.BRACE_LINE_FRAC_MAX, "Q-11"),
        (stats["has_lorem"] > 0, "Q-12"),
        (lang_mismatch, "L-1"),
        (ppl > R.PPL_MAX, "P-1"),
        (profanity_hits >= R.PROFANITY_MIN_HITS, "T-1"),
    ]
    arr = F.array(*[F.when(cond, F.lit(code)) for cond, code in checks])
    return F.array_sort(F.filter(arr, lambda x: x.isNotNull()))


# ---------------------------------------------------------------------------
# Pure-Python mirror (oracle / differential side)
# ---------------------------------------------------------------------------

def py_words(text: str) -> list[str]:
    return [w for w in (text or "").split() if w]


def py_lines(text: str) -> list[str]:
    return [l for l in (text or "").split("\n") if l != ""]


def py_rep_line_frac(text: str) -> float:
    lines = py_lines(text)
    if not lines:
        return 0.0
    total = sum(len(l) for l in lines)
    if total == 0:
        return 0.0
    c = Counter(lines)
    dup = sum(len(l) * (n - 1) for l, n in c.items() if n > 1)
    return dup / total


def py_top_word_frac(text: str) -> float:
    words = py_words(text)
    if not words:
        return 0.0
    c = Counter(words)
    return max(c.values()) / len(words)


def py_stats(text: str) -> dict[str, float]:
    text = text or ""
    words = py_words(text)
    lines = py_lines(text)
    n_words = len(words)
    n_lines = len(lines)
    nw = max(n_words, 1)
    nl = max(n_lines, 1)
    return {
        "n_words": n_words,
        "n_lines": n_lines,
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "symbol_ratio": sum(1 for ch in text if ch in R.SYMBOLS) / nw,
        "stopword_frac": sum(1 for w in words if w.lower() in STOPWORDS) / nw,
        "bullet_frac": sum(1 for l in lines if l.startswith(("- ", "* ", "•"))) / nl,
        "ellipsis_frac": sum(1 for l in lines if l.endswith("...")) / nl,
        "rep_line_frac": py_rep_line_frac(text),
        "top_word_frac": py_top_word_frac(text),
        "brace_line_frac": sum(1 for l in lines if "{" in l or "}" in l) / nl,
        "has_lorem": 1.0 if "lorem ipsum" in text.lower() else 0.0,
    }


def py_fired_rules(
    stats: dict[str, float],
    lang_mismatch: bool,
    ppl: float,
    profanity_hits: int,
) -> list[str]:
    fired = []
    if stats["n_words"] < R.MIN_WORDS:
        fired.append("Q-1")
    if stats["n_words"] > R.MAX_WORDS:
        fired.append("Q-2")
    if stats["n_words"] > 0 and not (
        R.MIN_MEAN_WORD_LEN <= stats["mean_word_len"] <= R.MAX_MEAN_WORD_LEN
    ):
        fired.append("Q-3")
    if stats["symbol_ratio"] > R.SYMBOL_WORD_RATIO_MAX:
        fired.append("Q-4")
    if stats["stopword_frac"] < R.STOPWORD_FRAC_MIN:
        fired.append("Q-6")
    if stats["rep_line_frac"] > R.REP_LINE_FRAC_MAX:
        fired.append("Q-7")
    if stats["bullet_frac"] > R.BULLET_LINE_FRAC_MAX:
        fired.append("Q-8")
    if stats["ellipsis_frac"] > R.ELLIPSIS_LINE_FRAC_MAX:
        fired.append("Q-9")
    if stats["top_word_frac"] > R.TOP_WORD_FRAC_MAX:
        fired.append("Q-10")
    if stats["brace_line_frac"] > R.BRACE_LINE_FRAC_MAX:
        fired.append("Q-11")
    if stats["has_lorem"] > 0:
        fired.append("Q-12")
    if lang_mismatch:
        fired.append("L-1")
    if ppl > R.PPL_MAX:
        fired.append("P-1")
    if profanity_hits >= R.PROFANITY_MIN_HITS:
        fired.append("T-1")
    return sorted(fired)
