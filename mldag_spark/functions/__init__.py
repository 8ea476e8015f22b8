"""Reusable JVM-side column expressions.

Everything here is built from ``pyspark.sql.functions`` primitives so
it stays inside whole-stage codegen — no Python/Pandas UDFs in these
hot paths. (UDF-based variants for genuinely non-expressible logic
live in ``mldag_spark.operators``.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


# ---------------------------------------------------------------------------
# vector math over array<double> columns
# ---------------------------------------------------------------------------
def dot(a, b) -> Column:
    """Dot product of two array<double> columns (fold left, JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a, b) -> Column:
    """Cosine similarity of two array<double> columns."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# text primitives
# ---------------------------------------------------------------------------
def normalize_text(c) -> Column:
    """Lowercase + collapse whitespace — the canonical form used by
    dedup/fingerprint operators."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokenize(c) -> Column:
    """Whitespace tokenization into array<string>."""
    return F.split(normalize_text(c), " ")


def bpe_ish_tokens(c) -> Column:
    """BPE-ish regex tokenization: runs of letters, runs of digits, or
    single punctuation marks (the standard pre-tokenizer shape)."""
    return F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)


def shingles(tokens, k: int = 3) -> Column:
    """k-word shingles (space-joined) from a token array column.

    Documents shorter than ``k`` tokens produce their single full-text
    shingle, so no document vanishes from dedup candidate generation.
    """
    n = F.size(tokens)
    return F.when(
        n <= k, F.array(F.concat_ws(" ", tokens))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)),
        )
    )


def fingerprint(c) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 exists in every engine, so oracles can reproduce it)."""
    return F.md5(normalize_text(c))
