"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All pure ``pyspark.sql.functions`` compositions —
whole-stage codegen, no Python in the hot path (SURVEY.md §2.2 scalar
families are the building blocks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from irio_mapreduce_spark.llm.dedup import tokens

# Tiny per-language marker profiles for the stopword-overlap language-ID
# heuristic. Real pipelines plug in real profiles (e.g. per-language top-1k
# stopwords); the operator is profile-agnostic.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
}

# A BPE-ish token estimate: runs of word chars, digits, or single
# punctuation — approximates subword-tokenizer counts far better than
# whitespace alone on real text.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count(text_col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col, lowercase=False))


def bpe_ish_count(text_col: str | Column) -> Column:
    """Regex-split pseudo-BPE token count (letters runs + digits + punct)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def type_token_ratio(text_col: str | Column) -> Column:
    t = tokens(text_col)
    return F.size(F.array_distinct(t)) / F.size(t)


def stopword_ratio(text_col: str | Column, stopwords: tuple[str, ...]) -> Column:
    t = tokens(text_col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(t, lambda w: F.array_contains(sw, w)))
    return hits / F.size(t)


def punct_ratio(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.length(c)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard quality-filter features. Downstream filters pick
    thresholds (e.g. C4-style: drop docs with too-low stopword ratio or
    degenerate type/token ratio)."""
    return df.withColumns(
        {
            "n_tokens": token_count(text_col),
            "n_bpe_ish": bpe_ish_count(text_col),
            "ttr": F.round(type_token_ratio(text_col), 6),
            "mean_word_len": F.round(
                F.aggregate(
                    tokens(text_col), F.lit(0).cast("long"), lambda a, t: a + F.length(t)
                )
                / token_count(text_col),
                6,
            ),
        }
    )


def langid_scores(text_col: str | Column) -> dict[str, Column]:
    """Stopword-overlap score per profile language (count of profile-word
    occurrences, normalized by token count)."""
    t = tokens(text_col)
    out = {}
    for lang, words in LANG_PROFILES.items():
        sw = F.array(*[F.lit(s) for s in words])
        out[lang] = F.size(F.filter(t, lambda w: F.array_contains(sw, w))) / F.size(t)
    return out


def langid_predict(text_col: str | Column) -> Column:
    """Argmax over profile scores with a fixed tie-break order (en > de >
    fr) so the prediction is deterministic and oracle-expressible."""
    s = langid_scores(text_col)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when(s["de"] >= s["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def positional_fingerprint(text_col: str | Column, mod: int = 2147483647) -> Column:
    """Order-sensitive document fingerprint: sum over token positions of
    ``i * h(token_i) mod M`` where ``h`` uses only portable primitives
    (length, first code point) so any SQL engine can reproduce it.
    Detects reorderings that set-based fingerprints miss; computed per-row
    with higher-order functions (no shuffle)."""
    t = tokens(text_col)
    return F.aggregate(
        F.transform(
            t,
            lambda tok, i: (i + 1)
            * (F.length(tok) * 31 + F.ascii(F.substring(tok, 1, 1)))
            % F.lit(mod),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: (acc + x) % F.lit(mod),
    )
