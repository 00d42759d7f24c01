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
