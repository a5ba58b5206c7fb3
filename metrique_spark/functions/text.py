"""Text analysis operators over a document table.

All pure column expressions — whole-stage codegen, no Python in the row
path. Designed for the ``documents`` table shape (``doc_id, text, lang,
source, n_chars``) but parameterized on column names.

These extend the reference's capability surface (its `convert`/`variants`
ingest hooks, ``core_api.py:393-410``) with the text ops a 100 TB training
-data pipeline needs: token counting, quality scoring, language id,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[^\W_]+"  # unicode word runs, BPE-ish pre-tokenization
_WS_SPLIT = r"\s+"


def tokens(text: Column | str) -> Column:
    """Lowercased word tokens (regexp extract-all, JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def token_count(text: Column | str) -> Column:
    """Whitespace-ish token count."""
    return F.size(tokens(text))


def char_classes(text: Column | str) -> dict[str, Column]:
    """Character-class counts used by quality scoring."""
    c = F.col(text) if isinstance(text, str) else text
    total = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^\p{L}]", ""))
    digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    space = F.length(F.regexp_replace(c, r"[^\s]", ""))
    return {"total": total, "alpha": alpha, "digit": digit,
            "punct": punct, "space": space}


def quality_score(text: Column | str, decimals: int = 4) -> Column:
    """Heuristic document quality in [0,1]: rewards alpha density and
    reasonable length, penalizes punctuation/digit overload. Deterministic,
    expressible in ANSI SQL for oracle parity."""
    cc = char_classes(text)
    total = F.greatest(cc["total"], F.lit(1)).cast("double")
    alpha_ratio = cc["alpha"] / total
    punct_ratio = cc["punct"] / total
    digit_ratio = cc["digit"] / total
    length_score = F.least(total / F.lit(500.0), F.lit(1.0))
    raw = (
        F.lit(0.5) * alpha_ratio
        + F.lit(0.3) * length_score
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 4 + digit_ratio * 2, F.lit(1.0)))
    )
    return F.round(raw, decimals)


# tiny per-language stopword markers for the n-gram/stopword heuristic;
# deterministic and reproducible in plain SQL (LIKE counts)
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " de ", " que "],
}


def lang_id(text: Column | str) -> Column:
    """Language-ID heuristic: count per-language stopword markers in the
    lowercased text, take the argmax, 'und' (undetermined) if no marker
    hits. CASE-expression only — SQL-portable."""
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    padded = F.concat(F.lit(" "), c, F.lit(" "))

    def score(markers: list[str]) -> Column:
        out = F.lit(0)
        for m in markers:
            # occurrence count via length difference
            out = out + (
                (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit(""))))
                / F.lit(len(m))
            ).cast("int")
        return out

    scores = {lang: score(m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    # nested CASE; deterministic tie-break = first alphabetical max
    result = None
    for lang in sorted(scores):
        cond = (best > 0) & (scores[lang] == best)
        result = F.when(cond, F.lit(lang)) if result is None else result.when(cond, F.lit(lang))
    return result.otherwise(F.lit("und"))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 over the canonical token stream (lowercase,
    punctuation-insensitive, single-space-joined). Collision-safe enough for
    dedup keys; md5 chosen so DuckDB oracles can reproduce it exactly."""
    return F.md5(F.array_join(tokens(text), " "))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience projection with all text-analysis columns."""
    cc = char_classes(text_col)
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fp"),
        F.round(cc["punct"] / F.greatest(cc["total"], F.lit(1)), 4).alias("punct_ratio"),
    )
