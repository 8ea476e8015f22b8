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


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Exact two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) final fold.

    ``aggs`` maps output column name → *algebraic* aggregate expression
    (sum/count/min/max — anything where agg(agg(parts)) == agg(whole)
    after the documented fold: counts re-sum, sums re-sum, min/max
    re-min/max). The fold is inferred from the outer function name.
    """
    fold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )
    finals = []
    for name, expr in aggs.items():
        # expression head, e.g. sum(...), count(...)
        head = expr._jc.toString().split("(", 1)[0].lower()
        if head not in fold:
            raise ValueError(
                f"{name}: non-algebraic aggregate {head!r} cannot be salted"
            )
        finals.append(fold[head](f"_p_{name}").alias(name))
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
    """
    p = probe.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = p.join(b, [key, "_salt"], how)
    return out.drop("_salt")
