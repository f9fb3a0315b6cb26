"""Text-analysis operators (EXT E12): tokenization, shingling,
fingerprinting, token counting, language-ID, quality scoring.

Everything is a Column expression over built-in functions — at 100 TB
these run inside whole-stage codegen with zero Python in the row path,
and none of them shuffle (pure per-row map). Each helper has an ANSI
rendering (``sql_*``) so plans can keep the DuckDB oracle literally in
sync with the Spark expression (same operation order → bit-identical
doubles).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- tokenization -----------------------------------------------------------

def tokens(text: str | Column) -> Column:
    """Whitespace tokenization (fixture docs are single-spaced)."""
    return F.split(_col(text), " ")


#: BPE-ish word/number/symbol splitter; restricted to a regex subset with
#: identical semantics in Java (Spark) and RE2 (DuckDB).
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_count(text: str | Column) -> Column:
    """Count of BPE-style tokens (letters runs / digit runs / symbols)."""
    return F.regexp_count(_col(text), F.lit(BPE_PATTERN))


def sql_bpe_token_count(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_PATTERN}'))"


# -- shingling --------------------------------------------------------------

def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles (space-joined token windows). Documents
    shorter than n tokens collapse to a single whole-doc shingle."""
    win = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(win)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def sql_shingles(toks_expr: str, n: int = 3) -> str:
    """DuckDB rendering of :func:`shingles` (1-based inclusive slices)."""
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_distinct([array_to_string({toks_expr}[i:i+{n - 1}], ' ') "
        f"for i in generate_series(1, len({toks_expr})-{n - 1})]) "
        f"ELSE [array_to_string({toks_expr}, ' ')] END"
    )


# -- fingerprinting ---------------------------------------------------------

def normalize_text(text: str | Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(_col(text))), r"\s+", " ")


def sql_normalize_text(expr: str) -> str:
    return f"regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g')"


def fingerprint(text: str | Column) -> Column:
    """Whole-document fingerprint: md5 of the normalized text (md5 is
    the one hash both engines share, keeping it oracle-checkable)."""
    return F.md5(normalize_text(text))


def sql_fingerprint(expr: str) -> str:
    return f"md5({sql_normalize_text(expr)})"


def shingle_fingerprint(toks: Column, n: int = 5) -> Column:
    """Winnowing-style rolling fingerprint: min md5 over n-gram shingles.
    Stable under local edits far from the minimum — a cheap near-dup
    prefilter key."""
    return F.array_min(F.transform(shingles(toks, n), F.md5))


def sql_shingle_fingerprint(toks_expr: str, n: int = 5) -> str:
    return f"list_min(list_transform({sql_shingles(toks_expr, n)}, s -> md5(s)))"


def sql_winnow_sel(src: str = "documents", *, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 8, w: int = 4) -> str:
    """CTE chain (``toks``/``g``/``w``/``sel``) mirroring
    ``operators.dedup.winnow_fingerprints`` literally: ``sel`` is the
    distinct ``(doc_id, f)`` winnowing-fingerprint relation.  md5 over
    space-joined token slices and lexicographic hex MIN are identical
    in both engines, so the selection — and therefore any blocking
    built on it — reproduces exactly.  Compose as
    ``WITH {sql_winnow_sel(...)}{sql_winnow_cands(...)} SELECT ...``."""
    return f"""
        toks AS (
            SELECT {id_col} AS doc_id,
                   list_filter(string_split({text_col}, ' '),
                               x -> x <> '') AS t
            FROM {src}
        ),
        g AS (
            SELECT doc_id, i AS pos,
                   md5(array_to_string(t[i:i+{k - 1}], ' ')) AS gh
            FROM toks,
                 unnest(generate_series(1, len(t) - {k} + 1)) AS u(i)
        ),
        w AS (
            SELECT doc_id, pos,
                   MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW
                                 AND {w - 1} FOLLOWING) AS wmin,
                   MAX(pos) OVER (PARTITION BY doc_id) AS mx
            FROM g
        ),
        sel AS (
            SELECT DISTINCT doc_id, wmin AS f
            FROM w WHERE pos <= GREATEST(mx - {w - 1}, 1)
        )"""


def sql_winnow_cands(max_df: int) -> str:
    """CTE chain (``cnt``/``keep``/``cand``) mirroring
    ``operators.dedup.winnow_candidate_pairs`` over a preceding ``sel``
    CTE (:func:`sql_winnow_sel`): distinct candidate pairs sharing a
    fingerprint with document frequency ≤ ``max_df``."""
    return f""",
        cnt AS (SELECT f, COUNT(*) AS c FROM sel GROUP BY f),
        keep AS (SELECT f FROM cnt WHERE c <= {max_df}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sel a
            JOIN keep k ON k.f = a.f
            JOIN sel b ON b.f = a.f AND a.doc_id < b.doc_id
        )"""


# -- language ID ------------------------------------------------------------

#: Tiny per-language stopword lists (public, frequency-ranked heads).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "it", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den"),
    "fr": ("le", "la", "les", "et", "des", "est", "dans", "une"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我"),
}

#: Deterministic priority order for score ties.
LANG_ORDER: tuple[str, ...] = ("en", "es", "de", "fr", "zh")


def lang_score(toks: Column, lang: str) -> Column:
    """Stopword hits (multiset — duplicates count) for one language."""
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def sql_lang_score(toks_expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, t -> t IN ({words})))"


def lang_pred(toks: Column) -> Column:
    """n-gram/stopword language-ID heuristic: argmax of per-language
    stopword hit counts, ties broken by LANG_ORDER (so all-zero scores
    deterministically yield 'en')."""
    scores = {lang: lang_score(toks, lang) for lang in LANG_ORDER}
    expr = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        rest = [scores[other] for other in LANG_ORDER if other != lang]
        expr = F.when(scores[lang] >= F.greatest(*rest), F.lit(lang)).otherwise(expr)
    return expr


def sql_lang_pred(toks_expr: str) -> str:
    parts = []
    for lang in LANG_ORDER[:-1]:
        rest = ", ".join(
            sql_lang_score(toks_expr, other) for other in LANG_ORDER if other != lang
        )
        parts.append(
            f"WHEN {sql_lang_score(toks_expr, lang)} >= GREATEST({rest}) THEN '{lang}'"
        )
    return "CASE " + " ".join(parts) + f" ELSE '{LANG_ORDER[-1]}' END"


# -- quality scoring --------------------------------------------------------

def quality_score(text: str | Column) -> Column:
    """Deterministic [0,1] quality heuristic: token-count saturation,
    type/token diversity, average token length — the standard cheap
    pretraining-corpus filters. Integer-derived doubles and a fixed
    operation order keep it bit-identical across engines."""
    t = _col(text)
    toks = tokens(t)
    n_tokens = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    # single-spaced text: token characters = length - (n_tokens - 1)
    tok_chars = (F.length(t).cast("double") - (n_tokens - F.lit(1.0)))
    avg_tok_len = tok_chars / n_tokens
    return (
        F.lit(0.3) * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
        + F.lit(0.4) * (n_distinct / n_tokens)
        + F.lit(0.3) * F.least(avg_tok_len / F.lit(8.0), F.lit(1.0))
    )


def sql_quality_score(expr: str) -> str:
    toks = f"string_split({expr}, ' ')"
    n_tokens = f"CAST(len({toks}) AS DOUBLE)"
    n_distinct = f"CAST(len(list_distinct({toks})) AS DOUBLE)"
    tok_chars = f"(CAST(length({expr}) AS DOUBLE) - ({n_tokens} - 1.0))"
    return (
        f"0.3 * LEAST({n_tokens} / 50.0, 1.0) "
        f"+ 0.4 * ({n_distinct} / {n_tokens}) "
        f"+ 0.3 * LEAST(({tok_chars} / {n_tokens}) / 8.0, 1.0)"
    )


# -- hashed-feature linear classifier --------------------------------------

def hashed_token_weight(tok: Column) -> Column:
    """Deterministic integer weight ∈ [−8, 8] per token from md5 — the
    cross-engine stand-in for a trained hashed-feature weight table
    (same lookup shape: hash token → weight slot). Shared by the
    oracle-checked query (plans/llm15.quality_classifier_linear) and
    the prep-DAG gate (pipeline.training_data_definitions) so the
    twins cannot drift."""
    return (F.conv(F.substring(F.md5(tok), 1, 2), 16, 10).cast("long")
            % 17 - 8)


def sql_hashed_token_weight(tok_expr: str) -> str:
    return f"(('0x' || substr(md5({tok_expr}), 1, 2))::UBIGINT % 17)::BIGINT - 8"


def hashed_linear_score_num(text: str | Column) -> Column:
    """Integer score numerator: Σ weight(token) over whitespace tokens
    (row-local JVM fold; divide by token count for the mean score)."""
    return F.aggregate(
        F.transform(tokens(text), hashed_token_weight),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sql_hashed_linear_score_num(expr: str) -> str:
    return (f"list_sum(list_transform(string_split({expr}, ' '), "
            f"t -> {sql_hashed_token_weight('t')}))::BIGINT")
