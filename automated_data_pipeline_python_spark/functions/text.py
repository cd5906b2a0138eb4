"""Portable text-analysis column expressions (SURVEY.md §2.8 targets).

Each helper returns a pair of SQL fragments — Spark SQL and DuckDB SQL —
computing bit-identical values, so every text operator can be validated
against the DuckDB oracle. The shared primitive is a 60-bit (or 28-bit)
hash derived from SHA-256 hex, which both engines can parse:

  Spark : CAST(conv(substr(sha2(s, 256), 1, 15), 16, 10) AS BIGINT)
  DuckDB: CAST('0x' || substr(sha256(s), 1, 15) AS BIGINT)

Spark expressions stay JVM-side (whole-stage codegen; no Python UDFs).
"""

from __future__ import annotations

# Language-ID stopword profiles (tiny, deterministic; a real deployment
# would load larger profiles — the operator shape is identical).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "von"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "fr": ("le", "les", "des", "et", "une", "dans"),
    "zh": ("的", "是", "在", "了", "不", "我"),
}


def spark_hash60(expr: str) -> str:
    return f"CAST(conv(substr(sha2({expr}, 256), 1, 15), 16, 10) AS BIGINT)"


def duck_hash60(expr: str) -> str:
    return f"CAST('0x' || substr(sha256({expr}), 1, 15) AS BIGINT)"


def spark_hash28(expr: str) -> str:
    return f"CAST(conv(substr(sha2({expr}, 256), 1, 7), 16, 10) AS BIGINT)"


def duck_hash28(expr: str) -> str:
    return f"CAST('0x' || substr(sha256({expr}), 1, 7) AS BIGINT)"


# Whitespace tokenization. Both engines: regex split of trimmed text.
SPARK_TOKENS = "split(trim({col}), '\\\\s+')"
DUCK_TOKENS = "regexp_split_to_array(trim({col}), '\\s+')"


def spark_word_shingles(tokens: str, n: int) -> str:
    """Word n-gram shingles from a token-array column (0-based indexing)."""
    parts = ", ".join(f"{tokens}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN size({tokens}) >= {n} THEN "
        f"transform(sequence(0, size({tokens}) - {n}), i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )


def duck_word_shingles(tokens: str, n: int) -> str:
    """DuckDB mirror (1-based list indexing; generate_series is inclusive)."""
    parts = " || ' ' || ".join(f"{tokens}[i + {j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, len({tokens}) - {n - 1}), "
        f"i -> {parts})"
    )


def stopword_hits_case(token_var: str, lang: str) -> str:
    """CASE fragment counting stopword membership — same text both dialects."""
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return f"CASE WHEN {token_var} IN ({words}) THEN 1 ELSE 0 END"


def spark_stopword_hits(tokens: str, lang: str) -> str:
    return (
        f"aggregate(transform({tokens}, t -> {stopword_hits_case('t', lang)}), "
        f"0, (acc, x) -> acc + x)"
    )


def duck_stopword_hits(tokens: str, lang: str) -> str:
    # list_sum returns DOUBLE in DuckDB; cast back to INT for parity with
    # Spark's integer aggregate.
    return (
        f"CAST(coalesce(list_sum(list_transform({tokens}, "
        f"t -> {stopword_hits_case('t', lang)})), 0) AS INT)"
    )
