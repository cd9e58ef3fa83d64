"""Text-analysis column functions for large-scale document pipelines.

All pure `pyspark.sql.functions` compositions — JVM-side, whole-stage
codegen'd, no Python UDFs — so they vectorize over 100 TB of documents
exactly like any built-in expression.  Hashing is md5-based (not
Spark's xxhash) so the DuckDB differential oracle can reproduce every
value bit-for-bit.

Generalizes the reference's string surface (header normalization at
/root/reference/load_quality.py:102, value maps at :103-105) into the
document-pipeline operators the 100 TB target needs: tokenization,
fingerprinting, quality scoring, language-ID heuristics.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _floor6(col: Column) -> Column:
    # local twin of functions.deterministic.floor6 (avoids an import cycle)
    return F.floor(col * F.lit(1000000.0)) / F.lit(1000000.0)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space; matches oracle string_split)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.split(col, " ")


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def unique_token_count(col: Column | str) -> Column:
    return F.size(distinct_tokens(col))


#: BPE-style pre-tokenization: letter runs | digit runs | punctuation runs.
#: Kept to RE2-compatible constructs so Spark (Java regex) and DuckDB (RE2)
#: extract identical token streams.
BPE_PRETOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


def regex_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenizer: the subword-merge *input* segmentation
    (letters/digits/punct split), the standard first stage of
    GPT-2/tiktoken-style tokenizers."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), 0)


def regex_tokens_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{BPE_PRETOKEN_RE}')"


def normalize_text(col: Column | str) -> Column:
    """Canonical form for near-dup fingerprinting: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    col = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(col), "[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(cleaned, " +", " "))


def normalize_text_sql(expr: str) -> str:
    # DuckDB regexp_replace needs the 'g' flag for replace-all semantics
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), '[^a-z0-9 ]', '', 'g'),"
        f" ' +', ' ', 'g'))"
    )


def fingerprint(col: Column | str) -> Column:
    """128-bit content fingerprint (md5 hex) of the normalized text."""
    return F.md5(normalize_text(col))


def fingerprint_sql(expr: str) -> str:
    return f"md5({normalize_text_sql(expr)})"


def hex_hash64(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit integer hash portable across engines.

    md5 -> first 15 hex digits -> bigint.  Used as the hash family for
    MinHash/SimHash so oracle SQL can recompute identical signatures.
    """
    salted = F.concat(F.lit(salt), F.lit("|"), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def hex_hash64_sql(expr: str, salt: str = "") -> str:
    salted = f"'{salt}' || '|' || ({expr})" if salt else f"({expr})"
    return f"CAST(('0x' || substr(md5({salted}), 1, 15)) AS BIGINT)"


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Character n-gram shingles of the normalized text (distinct).

    Built from n shifted slices of the char array zip_with'd together
    (the token_shingles trick) rather than
    ``transform(sequence, i -> substr(norm, i, n))``: a lambda that
    captures the ``normalize_text`` expression re-evaluates BOTH regex
    replaces per array element — O(len^2) regex work per row, measured
    14x slower on 300-char docs (58 s -> 4 s for a 5k-doc explode at
    sf0.1).  The slice arguments evaluate the normalization once per
    slice; the zip_with lambdas only concat.  Output is byte-identical
    to the old form for every length, including the len<n whole-string
    case and the empty string (split('','') = ['']).
    """
    norm = normalize_text(col)
    chars = F.split(norm, "")
    ln = F.length(norm)
    m = F.greatest(ln - (n - 1), F.lit(0))
    cur = F.slice(chars, 1, m)
    for j in range(2, n + 1):
        cur = F.zip_with(
            cur, F.slice(chars, j, m), lambda a, b: F.concat(a, b)
        )
    return F.array_distinct(F.when(ln >= n, cur).otherwise(F.array(norm)))


def token_shingles(col: Column | str, k: int = 5) -> Column:
    """All k-token shingles (overlapping windows joined by a space) of
    the whitespace token stream — the unit of corpus-level duplicate and
    contamination analysis.  Pure per-row array expression: no shuffle,
    no UDF; a doc with fewer than k tokens yields an empty array.
    """
    toks = tokens(col)
    n = F.size(toks)
    # fold k-1 zip_withs over k shifted slices instead of
    # transform(sequence, i -> slice(toks, i, k)): a slice whose START
    # is a per-element column falls off the codegen fast path and
    # measured ~6x slower; the shifted-slice form stays fully
    # vectorized and is O(tokens * k) either way
    m = F.greatest(n - F.lit(k - 1), F.lit(0))
    cur = F.slice(toks, 1, m)
    for j in range(2, k + 1):
        cur = F.zip_with(
            cur, F.slice(toks, j, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(n >= k, cur).otherwise(F.array().cast("array<string>"))


def token_shingles_sql(expr: str, k: int = 5) -> str:
    """DuckDB twin of token_shingles (1-based inclusive list slicing)."""
    toks = f"string_split({expr}, ' ')"
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(range(1, len({toks}) - {k - 1} + 1), "
        f"i -> array_to_string(({toks})[i:i+{k - 1}], ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Heuristic document-quality signals (all integer/ratio, portable)."""
    n_tok = token_count(text_col)
    n_uni = unique_token_count(text_col)
    n_chr = F.length(F.col(text_col))
    return {
        "n_chars_m": n_chr,
        "n_tokens": n_tok,
        "n_unique": n_uni,
        "uniq_ratio": _floor6(n_uni.cast("double") / n_tok.cast("double")),
        "mean_token_len": _floor6(
            (n_chr - (n_tok - F.lit(1))).cast("double") / n_tok.cast("double")
        ),
    }
