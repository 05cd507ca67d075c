"""Deterministic lexical resources — self-contained, no downloads.

Wordlists double as (a) the synthetic-page generator's vocabulary and
(b) the training corpus for the char-n-gram language-ID and perplexity
models, so model accuracy on the synthetic corpus holds by
construction (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

# Common function words per language (public knowledge, ~30 each).
LANG_WORDS: dict[str, list[str]] = {
    "en": (
        "the of and to in is was for on that with as his they be at one have this from "
        "or had by word but not what all were when your can said there use each which she"
    ).split(),
    "fr": (
        "le la les de des du et un une est dans pour que qui sur avec ne pas au aux ce "
        "cette il elle nous vous sont mais plus par son ses leur comme tout"
    ).split(),
    "es": (
        "el la los las de del y a en un una es no que por con para su al lo como mas "
        "pero sus le ya o este si porque esta entre cuando muy sin sobre"
    ).split(),
    "de": (
        "der die das und in den von zu mit sich des auf ist im dem nicht ein eine als "
        "auch es an werden aus er hat dass sie nach wird bei einer um"
    ).split(),
    # Mandarin: common single characters; generator joins without spaces.
    "zh": list("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下以生会自着去之过家学对可"),
}

# Stopwords for the density rule: union of latin-script function words.
STOPWORDS: frozenset[str] = frozenset(
    w for lang in ("en", "fr", "es", "de") for w in LANG_WORDS[lang]
)

# Content vocabulary for filler text (shared with /root/testdata docs flavor).
CONTENT_WORDS = (
    "data table query row scan filter join merge sort hash batch stream window "
    "partition shuffle spark vector key value group order line part agg small big "
    "fast slow index column record field block page cache disk memory node cluster"
).split()

# Mild profanity lexicon for the toxicity rule (placeholder-grade).
PROFANITY_WORDS = ["damn", "hell", "crap", "bastard", "moron", "idiot"]
