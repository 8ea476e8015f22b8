"""Reusable JVM-side column expressions.

Everything here is built from ``pyspark.sql.functions`` primitives —
no Python/Pandas UDFs, no serialization boundary. Precision caveat:
the vector folds (``dot``/``l2_norm``) and ``shingles`` are
higher-order functions, which the JVM evaluates *interpreted* (outside
whole-stage codegen). They are the correctness-baseline/ad-hoc forms;
the scale paths are the Arrow matmul kernels
(``operators.similarity``) and ``shingle_sets``/explode→groupBy
formulations, per the measurements in ``queries/text.py``.
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

    NB: this is a higher-order-function expression — interpreted per
    element, no codegen. Fine for ad-hoc use; the dedup pipelines use
    :func:`shingle_sets` (posexplode + window, fully codegen'd, ~10×
    faster and parallel after its shuffle) instead.
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


def shingle_rows(
    df,
    id_col: str,
    text_col: str,
    k: int = 3,
    carry: tuple = (),
    complete_only: bool = False,
):
    """(id, shingle) rows — k-word shingles per doc, possibly with
    duplicates (dedup happens in whatever aggregate consumes them).

    Formulation (r8, replacing the r2 posexplode + window-``lead``
    shape): zip the token array against its own k-1 shifted slices
    (``arrays_zip(slice(t,1,m), slice(t,2,m), ...)``, m = n-k+1) and
    explode the zipped structs — a MAP-ONLY pipeline. The window
    version shuffled every (id, pos, token) row and ran a per-doc
    sort just to line up adjacent tokens that ``slice`` lines up for
    free; measured on the full ``dedup_minhash_lsh`` at sf0.1:
    block-ordered A/B 3.97-4.2s window vs 2.74-2.9s zip, and an
    interleaved ABAB re-check on a noisier host min 5.64s vs 4.80s —
    consistently faster, honest effect ~15% (the block numbers were
    partly host-drift-flattered). The window's one redeeming feature
    — output
    arriving id-partitioned — is moot: every heavy consumer
    (``_lsh_pairs_impl``, ``jaccard_prefix_pairs``,
    ``overlap_pairs``) repartitions by id explicitly, and
    :func:`shingle_sets` now does the same, so exchange counts are
    unchanged while the sort disappears.

    ``arrays_zip``/``slice``/``concat_ws`` are ordinary JVM
    expressions (per-row loops, no per-element interpreted lambdas —
    the trap :func:`shingles` documents). One branch handles every
    document length (NOT a short/long filter union — that would scan
    the source once per branch per consumer subtree, and the plan pin
    caught FileScan 2 → 4): with m = max(n-k+1, 1) slices, a doc
    shorter than k slices past its end, ``arrays_zip`` null-pads the
    single zipped struct, and ``concat_ws`` skips the nulls — the
    full-text shingle, exactly the window shape's short-doc semantics
    (``tokenize("")`` is ``[""]``, so even an empty doc yields one
    empty shingle). Byte-identical multiset to the window
    formulation, pinned by
    ``test_sources.py::test_shingle_rows_zip_equals_reference``.

    ``carry``: extra columns passed through unchanged (e.g. a source
    or split-bucket column) — saves consumers a join back to the doc
    table. ``complete_only=True`` keeps only full k-grams: docs
    shorter than k tokens yield NO rows instead of their full-text
    shingle (the decontamination contract, where a partial tail gram
    must not alias a real one).
    """
    # selectExpr strings (r15): identical analyzed expressions to the
    # replaced Column chains (normalized executed-plan diff verified on
    # the dedup consumers), fewer py4j round trips in the driver
    # contract's timed construction region
    carry_sel = [f"`{c}`" for c in carry]
    base = df.selectExpr(
        f"`{id_col}`",
        *carry_sel,
        rf"split(trim(regexp_replace(lower(`{text_col}`), '\\s+', ' ')), ' ')"
        " AS _t",
    )
    if complete_only:
        base = base.filter(f"size(_t) >= {int(k)}")
        m = f"size(_t) - {int(k)} + 1"
    else:
        m = f"greatest(size(_t) - {int(k)} + 1, 1)"
    slices = ", ".join(f"slice(_t, {i + 1}, {m})" for i in range(k))
    fields = ", ".join(f"_z.`{i}`" for i in range(k))
    return base.selectExpr(
        f"`{id_col}`",
        *carry_sel,
        f"explode(arrays_zip({slices})) AS _z",
    ).selectExpr(
        f"`{id_col}`",
        *carry_sel,
        f"concat_ws(' ', {fields}) AS shingle",
    )


def shingle_sets(df, id_col: str, text_col: str, k: int = 3):
    """(id, sh: array<string>) — DISTINCT k-word shingle sets per doc.

    Same semantics as ``array_distinct(shingles(tokenize(text), k))``
    but built from :func:`shingle_rows`. The explicit id repartition
    pins the single-shuffle contract the r2 window formulation used to
    provide implicitly: one exchange of (id, shingle) rows, after
    which all downstream work is parallel even when the source
    parquet arrives as one partition.
    """
    return (
        shingle_rows(df, id_col, text_col, k)
        .repartition(F.col(id_col))
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh"))
    )


def fingerprint(c) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 exists in every engine, so oracles can reproduce it)."""
    return F.md5(normalize_text(c))


def winnow_fingerprints(df, id_col: str, text_col: str, k: int = 3, w: int = 4):
    """(id, fp) — winnowing fingerprints (Schleimer/Wilkerson/Aiken):
    hash every k-gram positionally, slide a window of ``w`` consecutive
    hashes, keep each window's minimum, emit the distinct set.

    Guarantees every shared run of ≥ w+k-1 tokens between two documents
    shares at least one fingerprint — the rolling-hash dedup primitive
    for partial-overlap (quotation/boilerplate) detection, where
    whole-set Jaccard is too coarse.

    Same execution shape as :func:`shingle_sets`: posexplode + window
    functions, all codegen'd, one shuffle on ``id``.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("_pos", "_t"),
    )
    wo = Window.partitionBy(id_col).orderBy("_pos")
    gram = F.concat_ws(
        " ", F.col("_t"), *[F.lead("_t", i).over(wo) for i in range(1, k)]
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    grams = toks.select(
        F.col(id_col),
        F.xxhash64(gram).alias("_h"),
        "_pos",
        n.alias("_n"),
    ).filter(
        (F.col("_pos") <= F.col("_n") - k)
        | ((F.col("_n") <= k) & (F.col("_pos") == 0))
    )
    roll = wo.rowsBetween(0, w - 1)
    return (
        grams.select(
            F.col(id_col), F.min("_h").over(roll).alias("fp")
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Exact-summation guards for the DuckDB value-hash gate
# ---------------------------------------------------------------------------
# ROUND(SUM(<double expr>), k) is order-of-summation dependent in the
# last float bit: Spark's partial aggregates accumulate in partition
# order (which shifts with partition count / AQE) while DuckDB uses its
# own order, so a sum landing within float noise of a 0.5·10^-k
# boundary rounds differently per engine — a penny-level, plan-dependent
# flake. Summing an exact DECIMAL instead makes the aggregate
# order-independent and bit-identical on both engines at ANY
# partitioning, which is precisely what a 100 TB re-partition must not
# break. The per-row cast is exact-enough (half-up at 1e-6 on identical
# doubles) and decimal(18,6) holds |x| < 1e12, far above any per-row
# money value in the schema.
#
# SQL oracle mirrors: see DSUM_SQL / DAVG_SQL format helpers.

_DEC = "decimal(18,6)"


def _dec(c):
    if isinstance(c, str):
        c = F.col(c)
    return c.cast(_DEC)


def dsum(c, scale: int = 2):
    """Order-independent ROUND(SUM(c), scale) as a double column."""
    return F.round(F.sum(_dec(c)), scale).cast("double")


def davg(c, scale: int = 4):
    """Order-independent ROUND(AVG(c), scale): exact decimal sum cast
    to double, divided by the group count (both engines perform the
    identical IEEE division), then rounded.

    KNOWN TIE HAZARD (measured, sf0.1 events): when the exact quotient
    lands on a half-up boundary at ``scale`` (e.g. 1512.12/32 =
    47.25375 at scale 4), Spark rounds the double's SHORTEST-STRING
    form (BigDecimal.valueOf → "47.25375" → .2538) while DuckDB rounds
    the BINARY value (47.2537499…994 → .2537) — a one-ulp disagreement
    no summation guard can fix. Gates whose groups can produce such
    rational quotients should prefer :func:`dsum` (+ a count column)
    and let consumers divide, as ``events_gapfill_hourly`` does."""
    return F.round(
        F.sum(_dec(c)).cast("double") / F.count(F.lit(1)), scale
    )


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB oracle equivalent of :func:`dsum`."""
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(18,6))), {scale})"
        " AS DOUBLE)"
    )


def davg_sql(expr: str, scale: int = 4) -> str:
    """DuckDB oracle equivalent of :func:`davg`."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT(*), {scale})"
    )


# PII-shaped patterns written in the common Java-regex ∩ RE2 dialect
# (no backrefs/lookaround), so Spark's regexp_replace and any
# SQL-engine oracle agree match-for-match.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+1-555-[0-9]{4}",
}


def redact(c, patterns: dict[str, str] | None = None) -> Column:
    """Replace every match of every pattern with ``[<NAME>]`` — chained
    codegen'd ``regexp_replace`` calls, one pass per pattern, no UDF.
    Order is the dict's insertion order (earlier patterns consume text
    first, exactly like the sequential SQL form)."""
    out = c
    for name, pat in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def pattern_count(c, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` (codegen'd
    regexp_count; the oracle form is len(regexp_extract_all(...)))."""
    return F.regexp_count(c, F.lit(pattern))
