"""Text-analysis operators: token counting, quality scoring,
marker-word language ID, document fingerprinting.

These are SQL-expressible (differential-testable against the DuckDB
oracle) siblings of the pipeline's Arrow-UDF scorers; pytest also
cross-checks them against the pure-Python implementations.

Determinism: identical regex dialect subset (no \\b, no lookaround —
Java and RE2 agree on the patterns used), integer-ratio arithmetic and
explicit rounding on every emitted double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wtq.rules.lexicon import LANG_WORDS, STOPWORDS

# Word chars runs OR single non-word non-space char — a BPE-ish
# pre-tokenizer regex (identical semantics in Java regex and RE2).
BPE_TOKEN_RE = "[a-zA-Z0-9]+|[^a-zA-Z0-9 ]"

_MARKER_LANGS = ("en", "fr", "es", "de")


def words_arr(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: w != "")


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(words_arr(t)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0)).alias("bpe_tokens"),
    )


def _stat_cols(t: Column) -> dict[str, Column]:
    words = words_arr(t)
    n = F.size(words)
    nw = F.greatest(n, F.lit(1)).cast("double")
    # isin → codegen InSet hash lookup (round-6; value-identical to the
    # interpreted array_contains scan, ~4× faster per word)
    stop_list = sorted(STOPWORDS)
    return {
        "n_words": n,
        "mean_word_len": F.aggregate(words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)).cast("double") / nw,
        "stopword_frac": F.size(F.filter(words, lambda w: F.lower(w).isin(*stop_list))).cast("double") / nw,
        "symbol_frac": (F.length(t) - F.length(F.regexp_replace(t, "[#$%&*+<=>@^_|~]", ""))).cast("double") / nw,
    }


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite linear quality score in [0,1]-ish (pure arithmetic —
    bit-reproducible in any engine)."""
    s = _stat_cols(F.col(text_col))
    score = (
        s["stopword_frac"] * 0.5
        + (F.lit(1.0) - F.least(s["symbol_frac"], F.lit(1.0))) * 0.3
        + (F.lit(1.0) - F.least(F.abs(s["mean_word_len"] - 5.0) / 5.0, F.lit(1.0))) * 0.2
    )
    return df.select(
        F.col(id_col),
        s["n_words"].alias("n_words"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_markers(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: count per-language function words,
    argmax with fixed tie-break order (en,fr,es,de)."""
    words = words_arr(F.col(text_col))

    def _marker_count(marker_list):
        return F.size(F.filter(words, lambda w: F.lower(w).isin(*marker_list)))

    counts = {}
    for lang in _MARKER_LANGS:
        counts[lang] = _marker_count(sorted(set(LANG_WORDS[lang])))
    best = F.greatest(*[counts[lang] for lang in _MARKER_LANGS])
    pred = F.when(counts["en"] == best, "en")
    for lang in _MARKER_LANGS[1:]:
        pred = pred.when(counts[lang] == best, lang)
    return df.select(
        F.col(id_col),
        *[counts[lang].alias(f"c_{lang}") for lang in _MARKER_LANGS],
        pred.otherwise("und").alias("pred_lang"),
    )


def text_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counts + composite quality score + content fingerprint in
    ONE scan/projection — the columns a curation run actually wants
    side by side per document.  Consolidates the former token_counts /
    quality_score / fingerprints registry demos (50-entry driver cap);
    the standalone operators remain the public API."""
    t = F.col(text_col)
    s = _stat_cols(t)
    score = (
        s["stopword_frac"] * 0.5
        + (F.lit(1.0) - F.least(s["symbol_frac"], F.lit(1.0))) * 0.3
        + (F.lit(1.0) - F.least(F.abs(s["mean_word_len"] - 5.0) / 5.0, F.lit(1.0))) * 0.2
    )
    norm = F.array_join(words_arr(F.lower(t)), " ")
    return df.select(
        F.col(id_col),
        s["n_words"].alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0)).alias("bpe_tokens"),
        F.round(score, 6).alias("quality_score"),
        F.md5(F.encode(norm, "UTF-8")).alias("fp"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic content fingerprint (md5 of lowercase
    whitespace-normalized text)."""
    norm = F.array_join(words_arr(F.lower(F.col(text_col))), " ")
    return df.select(F.col(id_col), F.md5(F.encode(norm, "UTF-8")).alias("fp"))


# ---------------------------------------------------------------------------
# Oracle SQL builders (DuckDB)
# ---------------------------------------------------------------------------

def _sql_words(text: str) -> str:
    return f"list_filter(string_split({text}, ' '), x -> x <> '')"


def sql_token_counts(table: str, id_col: str, text_col: str) -> str:
    return f"""
    SELECT {id_col},
           CAST(len({_sql_words(text_col)}) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all({text_col}, '{BPE_TOKEN_RE}')) AS INT) AS bpe_tokens
    FROM {table}
    """


def _sql_stats(text_col: str) -> dict[str, str]:
    stop_list = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    w = _sql_words(text_col)
    return {
        "n_words": f"len({w})",
        "mean_word_len": f"CAST(list_sum(list_transform({w}, x -> length(x))) AS DOUBLE) / greatest(len({w}), 1)",
        "stopword_frac": f"CAST(len(list_filter({w}, x -> list_contains([{stop_list}], lower(x)))) AS DOUBLE) / greatest(len({w}), 1)",
        "symbol_frac": f"CAST(length({text_col}) - length(regexp_replace({text_col}, '[#$%&*+<=>@^_|~]', '', 'g')) AS DOUBLE) / greatest(len({w}), 1)",
    }


def sql_quality_score(table: str, id_col: str, text_col: str) -> str:
    s = _sql_stats(text_col)
    # coalesce(list_sum(...), 0) — DuckDB list_sum of empty list is NULL
    mean = f"coalesce({s['mean_word_len']}, 0.0)"
    score = (
        f"{s['stopword_frac']} * 0.5"
        f" + (1.0 - least({s['symbol_frac']}, 1.0)) * 0.3"
        f" + (1.0 - least(abs({mean} - 5.0) / 5.0, 1.0)) * 0.2"
    )
    return f"""
    SELECT {id_col}, CAST({s['n_words']} AS INT) AS n_words, round({score}, 6) AS quality_score
    FROM {table}
    """


def sql_lang_markers(table: str, id_col: str, text_col: str) -> str:
    w = _sql_words(text_col)
    counts = {}
    for lang in _MARKER_LANGS:
        lst = ", ".join(f"'{x}'" for x in sorted(set(LANG_WORDS[lang])))
        counts[lang] = f"len(list_filter({w}, x -> list_contains([{lst}], lower(x))))"
    best = "greatest(" + ", ".join(f"c_{l}" for l in _MARKER_LANGS) + ")"
    case = "CASE " + " ".join(
        f"WHEN c_{l} = {best} THEN '{l}'" for l in _MARKER_LANGS
    ) + " ELSE 'und' END"
    inner_cols = ", ".join(f"CAST({counts[l]} AS INT) AS c_{l}" for l in _MARKER_LANGS)
    return f"""
    SELECT {id_col}, {', '.join('c_' + l for l in _MARKER_LANGS)}, {case} AS pred_lang
    FROM (SELECT {id_col}, {inner_cols} FROM {table})
    """


def sql_text_metrics(table: str, id_col: str, text_col: str) -> str:
    s = _sql_stats(text_col)
    mean = f"coalesce({s['mean_word_len']}, 0.0)"
    score = (
        f"{s['stopword_frac']} * 0.5"
        f" + (1.0 - least({s['symbol_frac']}, 1.0)) * 0.3"
        f" + (1.0 - least(abs({mean} - 5.0) / 5.0, 1.0)) * 0.2"
    )
    w_norm = _sql_words(f"lower({text_col})")
    return f"""
    SELECT {id_col},
           CAST({s['n_words']} AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all({text_col}, '{BPE_TOKEN_RE}')) AS INT) AS bpe_tokens,
           round({score}, 6) AS quality_score,
           md5(array_to_string({w_norm}, ' ')) AS fp
    FROM {table}
    """


def sql_fingerprints(table: str, id_col: str, text_col: str) -> str:
    w = _sql_words(f"lower({text_col})")
    return f"""
    SELECT {id_col}, md5(array_to_string({w}, ' ')) AS fp FROM {table}
    """


# ---------------------------------------------------------------------------
# HTML → text extraction (round 5)
# ---------------------------------------------------------------------------
# The input hint's pages table carries an `html` binary column; the
# reference's ingest strips tag payloads before validation
# (water.lua:84-221 cleans tags per record).  This is the in-engine
# analog: a pure regexp_replace chain — whole-stage-codegen JVM
# expressions, zero Python — with a DuckDB mirror.  Pattern dialect is
# the Java∩RE2 subset (inline (?is) flags, lazy quantifiers, char
# classes; NO backreferences — RE2 lacks them, hence separate
# script/style patterns instead of <(script|style)>.*?</\1>).
#
# Entity decode order: named entities first, ampersand LAST, so
# double-encoded text ('&amp;lt;') decodes one level per pass exactly
# like a standards-following single-pass decoder.

_HTML_SCRIPT_RE = "(?is)<script[^>]*>.*?</script>"
_HTML_STYLE_RE = "(?is)<style[^>]*>.*?</style>"
_HTML_COMMENT_RE = "(?s)<!--.*?-->"
_HTML_TAG_RE = "<[^>]+>"
_HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                  ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def html_to_text(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Extract visible text from an HTML payload: drop script/style
    blocks and comments, count + strip the remaining tags, decode the
    common entities, collapse whitespace.  Returns
    (id_col, text, n_tags).  A narrow projection — survives any scale
    by construction (no shuffle, no UDF)."""
    s = F.col(html_col).cast("string")
    s = F.regexp_replace(s, _HTML_SCRIPT_RE, " ")
    s = F.regexp_replace(s, _HTML_STYLE_RE, " ")
    s = F.regexp_replace(s, _HTML_COMMENT_RE, " ")
    n_tags = F.size(F.regexp_extract_all(s, F.lit(_HTML_TAG_RE), 0))
    s = F.regexp_replace(s, _HTML_TAG_RE, " ")
    for ent, ch in _HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.trim(F.regexp_replace(s, "\\s+", " "))
    return df.select(F.col(id_col), s.alias("text"), n_tags.alias("n_tags"))


def sql_html_to_text(table: str, id_col: str, html_col: str) -> str:
    s = html_col
    # dotall/case flags ride INSIDE the patterns ((?is)/(?s)) so both
    # engines read them identically; only 'g' goes in the flag slot
    for pat in (_HTML_SCRIPT_RE, _HTML_STYLE_RE, _HTML_COMMENT_RE):
        s = f"regexp_replace({s}, '{pat}', ' ', 'g')"
    n_tags = f"len(regexp_extract_all({s}, '{_HTML_TAG_RE}'))"
    s = f"regexp_replace({s}, '{_HTML_TAG_RE}', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        lit = ch.replace("'", "''")
        s = f"replace({s}, '{ent.replace(chr(39), chr(39) * 2)}', '{lit}')"
    s = f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"
    return f"""
    SELECT {id_col}, {s} AS text, CAST({n_tags} AS INT) AS n_tags FROM {table}
    """


# ---------------------------------------------------------------------------
# URL normalization (round 5)
# ---------------------------------------------------------------------------
# Pre-dedup canonicalization (the C4/RefinedWeb discipline): without
# it, re-crawls of one page under 'HTTP://Host.com/p?utm_source=x#f'
# and 'http://host.com/p' count as distinct urls and slip past the
# re-crawl window dedup, which keys on exact url equality.  All steps
# are engine-portable expressions; the canonical form is:
#   lowercase scheme+authority · default ports stripped · fragment
#   dropped · tracking params (utm_*, fbclid, gclid, ref) dropped ·
#   remaining query params sorted · single trailing slash stripped.

_SCHEME_AUTH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
_TRACKING_RE = "^(utm_[A-Za-z0-9]+|fbclid|gclid|ref)="


def normalize_url_col(url: Column) -> Column:
    """Column-level canonicalization — shared by the `normalize_urls`
    operator and the pipeline's `normalize_urls` flag (which rewrites
    the url ahead of the re-crawl dedup window so crawl variants land
    in one group).  Pure expression: whole-stage codegen, no shuffle."""
    u = F.regexp_replace(url, "#.*", "")  # fragment
    head = F.lower(F.regexp_extract(u, _SCHEME_AUTH_RE, 0))
    tail = F.regexp_replace(u, _SCHEME_AUTH_RE, "")
    u = F.concat(head, tail)
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80(/|\\?|$)", "$1$2")
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443(/|\\?|$)", "$1$2")
    path = F.regexp_replace(u, "\\?.*", "")
    path = F.regexp_replace(path, "([^/])/$", "$1")  # trailing slash (root unifies to no-slash)
    query = F.regexp_extract(u, "\\?(.*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(path, F.when(qs == "", "").otherwise(F.concat(F.lit("?"), qs)))


def normalize_urls(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Canonical url per document: (id_col, url, norm_url)."""
    return df.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        normalize_url_col(F.col(url_col)).alias("norm_url"),
    )


def sql_normalize_urls(table: str, id_col: str, url_col: str) -> str:
    u = f"regexp_replace({url_col}, '#.*', '')"
    u = (
        f"(lower(regexp_extract({u}, '{_SCHEME_AUTH_RE}', 0)) || "
        f"regexp_replace({u}, '{_SCHEME_AUTH_RE}', ''))"
    )
    u = f"regexp_replace({u}, '^(http://[^/?#:]*):80(/|\\?|$)', '\\1\\2')"
    u = f"regexp_replace({u}, '^(https://[^/?#:]*):443(/|\\?|$)', '\\1\\2')"
    path = f"regexp_replace(regexp_replace({u}, '\\?.*', ''), '([^/])/$', '\\1')"
    query = f"regexp_extract({u}, '\\?(.*)', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}')))"
    )
    qs = f"array_to_string({params}, '&')"
    return f"""
    SELECT {id_col}, {url_col} AS url,
           ({path} || CASE WHEN {qs} = '' THEN '' ELSE '?' || {qs} END) AS norm_url
    FROM {table}
    """
