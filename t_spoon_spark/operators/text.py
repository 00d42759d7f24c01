"""Text-analysis operators for training-data pipelines: tokenization
stats, quality scoring, language-ID heuristic, fingerprinting.

All are pure Column compositions (JVM-side, codegen'd) — no Python in
the row path, so they scale linearly with input splits. Determinism
contract: every score is integer-scaled; the only hash primitive is
md5 (identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword lists per language for the lang-ID
# heuristic (n-gram/stopword scoring; real deployments would swap in a
# fastText-style model via pandas_udf)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ein"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (arrays stay JVM-side)."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def md5_long(col: Column) -> Column:
    """First 15 hex chars of md5 as BIGINT — the engine's portable
    deterministic hash (DuckDB twin: ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def dd_md5_long(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def marker_hits(toks: Column, markers: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(toks, lit_arr))


def quality_components(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio components of a quality
    score (the usual Gopher/C4-style heuristics, integer-scaled)."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.!?,;:]", ""))
    n_stop = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS])))
    n_uniq = F.size(F.array_distinct(toks))
    return {
        "n_tokens": n_tok,
        "n_chars_calc": n_chars,
        "n_punct": n_punct,
        # ratios scaled to 1e4 fixed-point (floor of exact int division
        # in double — identical across engines)
        "stop_ratio_c": F.floor(n_stop * 10000.0 / n_tok).cast("long"),
        "uniq_ratio_c": F.floor(n_uniq * 10000.0 / n_tok).cast("long"),
        "mean_tok_len_c": F.floor(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
            * 100.0
            / n_tok
        ).cast("long"),
    }


def lang_scores(toks: Column) -> list[tuple[str, Column]]:
    return [(lang, marker_hits(toks, ms)) for lang, ms in LANG_MARKERS.items()]


def lang_pred(toks: Column) -> Column:
    """Argmax language over marker-hit scores with a deterministic
    tiebreak (declaration order en, es, fr, de); 'unknown' when no
    marker hits."""
    scores = lang_scores(toks)
    expr = None
    for i, (lang, s) in enumerate(scores):
        cond = s > 0
        for j, (other, so) in enumerate(scores):
            if other == lang:
                continue
            cond = cond & ((s >= so) if j > i else (s > so))
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise("unknown")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over the normalized token stream
    (lowercase, whitespace-collapsed) — stable under formatting noise."""
    normalized = F.array_join(tokens(F.lower(text)), " ")
    return F.md5(normalized)


# BPE-ish subword pre-tokenization (GPT-2-style splitting approximated
# with an engine-portable pattern: letter runs, digit runs, single
# punctuation marks — Java and RE2 regex agree on this subset)
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

WINNOW_K = 8  # char k-gram length
WINNOW_W = 4  # winnowing window (MOSS-style: min hash per window)


def bpe_tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def winnow_fingerprints(text: Column) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken MOSS
    scheme): char 8-gram rolling hashes over the normalized token
    stream, min per 4-window, distinct mins. Guarantees any shared
    substring of length >= K+W-1 contributes a shared fingerprint.
    Pure nested array transforms — JVM-side, no Python."""
    span = WINNOW_K + WINNOW_W - 1
    # transform(array(x), v -> ...)[0] is the let-binding idiom: the
    # normalized string and the gram-hash array are each computed ONCE
    # per row (not once per window), and each gram is hashed once (not
    # once per covering window). CASE guard: Spark's sequence(1, 0) is
    # a DESCENDING [1, 0], not empty, so short docs short-circuit.
    return F.expr(
        f"""
        transform(array({_norm_sql()}), n ->
          CASE WHEN length(n) < {span + 1} THEN cast(array() as array<bigint>)
          ELSE transform(array(
                 transform(sequence(1, length(n) - {WINNOW_K - 1}),
                           j -> cast(conv(substring(md5(substring(n, j, {WINNOW_K})), 1, 15), 16, 10) as bigint))
               ), hs ->
                 array_distinct(transform(sequence(1, size(hs) - {WINNOW_W - 1}),
                                          i -> array_min(slice(hs, i, {WINNOW_W}))))
               )[0]
          END
        )[0]
        """
    )


def _norm_sql() -> str:
    return "array_join(filter(split(lower(text), '\\\\s+'), w -> w != ''), ' ')"
