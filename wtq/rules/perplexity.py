"""KenLM-style character-trigram perplexity scorer.

A deterministic stand-in for a KenLM model (not installable here): a
char-trigram LM with add-one smoothing, trained at import time on a
corpus synthesized from the embedded wordlists — self-contained, no
network (SURVEY.md §7 hard-part 5).  High perplexity ⇒ gibberish ⇒
rule P-1.

Pure-Python core shared by the Spark pandas UDF and the oracle.
"""

from __future__ import annotations

import math
from functools import lru_cache

from wtq.rules.lexicon import CONTENT_WORDS, LANG_WORDS

_ORDER = 3


@lru_cache(maxsize=1)
def _model() -> tuple[dict[str, int], dict[str, int], int]:
    """(trigram counts, bigram context counts, vocab size)."""
    corpus_words: list[str] = list(CONTENT_WORDS)
    for lang in ("en", "fr", "es", "de"):
        corpus_words.extend(LANG_WORDS[lang])
    corpus = " ".join(corpus_words)
    tri: dict[str, int] = {}
    bi: dict[str, int] = {}
    pad = "  " + corpus
    for i in range(len(pad) - 2):
        ctx = pad[i : i + 2]
        tg = pad[i : i + 3]
        tri[tg] = tri.get(tg, 0) + 1
        bi[ctx] = bi.get(ctx, 0) + 1
    vocab = len(set(corpus)) + 1
    return tri, bi, vocab


@lru_cache(maxsize=262144)
def _word_ll(w: str) -> tuple[float, int]:
    """(sum log-prob, n trigrams) for one space-padded word.  Word-level
    memoization: natural text repeats words constantly, so the hit rate
    is high and deterministic (same trick as langid._word_scores)."""
    tri, bi, vocab = _model()
    s = "  " + w + " "
    ll = 0.0
    n = 0
    for i in range(len(s) - 2):
        num = tri.get(s[i : i + 3], 0) + 1
        den = bi.get(s[i : i + 2], 0) + vocab
        ll += math.log(num / den)
        n += 1
    return ll, n


def char_perplexity(text: str, max_words: int = 400) -> float:
    """Per-char perplexity under the trigram LM, computed word-by-word
    (each word scored in a space-padded context, totals pooled); 0.0
    for empty text.  Work is capped at max_words per document to keep
    Arrow batches balanced (cost-bounding analog of st_subdivide,
    SURVEY.md §4)."""
    if not text:
        return 0.0
    words = text.lower().split()
    if not words:
        return 0.0
    ll = 0.0
    n = 0
    for w in words[:max_words]:
        wll, wn = _word_ll(w)
        ll += wll
        n += wn
    if n == 0:
        return 0.0
    return math.exp(-ll / n)


def char_perplexity_batch(texts) -> list[float]:
    return [char_perplexity(t if t is not None else "") for t in texts]
