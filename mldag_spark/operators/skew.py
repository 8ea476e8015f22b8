"""Skew-mitigation operators.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles most
runtime skew; these operators are for the cases planners can't fix:

- :func:`salted_aggregate` — two-phase aggregation for heavy-hitter
  group keys: a random salt spreads one hot key over ``n_salts``
  reducers, a second (tiny) aggregation folds the partials. Exact for
  algebraic aggregates (sum/count/min/max).
- :func:`salted_join` — replicates the (smaller) build side ``n_salts``
  times so a skewed probe key hashes to ``n_salts`` distinct reducers.
  Use when the build side is too big to broadcast but the probe side
  has pathological hot keys.

Both are deterministic in RESULT (not in partitioning): the salt only
routes rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_FOLD = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, "str | Column"]],
    n_salts: int = 16,
) -> DataFrame:
    """Exact two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) final fold.

    ``aggs`` maps output column name → ``(fn, column)`` where ``fn`` is
    one of ``sum``/``count``/``min``/``max`` — the *algebraic*
    aggregates, where agg(agg(parts)) == agg(whole) after the fold
    (counts re-sum, sums re-sum, min/max re-min/max). The explicit
    spec (not expression-head sniffing) keeps the fold choice stable
    across aliases, DISTINCT, and Spark versions.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partials, finals = [], []
    for name, (fn, col) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(
                f"{name}: non-algebraic aggregate {fn!r} cannot be salted "
                f"(supported: {sorted(_PARTIAL)})"
            )
        partials.append(_PARTIAL[fn](col).alias(f"_p_{name}"))
        finals.append(_FOLD[fn](f"_p_{name}").alias(name))
    partial = salted.groupBy(*keys, "_salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the probe side's hot keys are spread across
    ``n_salts`` reducers; the build side is exploded ×``n_salts`` so
    every (key, salt) bucket finds its match.

    Build-side blowup is the price — prefer broadcast when the build
    side fits, and AQE skew-splitting when skew is moderate; this is
    the remaining case (large build side + extreme probe skew).

    Only probe-preserving join types are allowed: the build side is
    exploded ×``n_salts``, so right/full outer joins would emit each
    unmatched build row ``n_salts`` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports probe-preserving joins only "
            f"({sorted(allowed)}), not {how!r}: the exploded build side "
            f"would duplicate unmatched build rows"
        )
    p = probe.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = p.join(b, [key, "_salt"], how)
    return out.drop("_salt")
