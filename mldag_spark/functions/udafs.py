"""Grouped-agg pandas UDFs (true UDAFs, Arrow-batched).

No ``from __future__ import annotations`` here: pandas_udf resolves
the real type hints to infer the GROUPED_AGG signature.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def mode_str(s: pd.Series) -> str:
    """Deterministic mode of a string column: most frequent value,
    ties broken toward the lexicographically smallest."""
    vc = s.value_counts()  # drops nulls; an all-null group yields empty
    if vc.empty:
        return None
    top = vc[vc == vc.max()]
    return sorted(top.index)[0]


@pandas_udf("long")
def mode_count(s: pd.Series) -> int:
    """Count of the modal value (pairs with :func:`mode_str`)."""
    vc = s.value_counts()
    return 0 if vc.empty else int(vc.max())


def split_words_udtf():
    """Python UDTF (table function): one (pos, word) row per token.

    The UDF/UDAF/UDTF surface's table-function corner. Row-wise Python
    is the slow path by this engine's own rules — the JVM equivalent
    is ``posexplode(split(...))``, which is what every hot query uses —
    so this exists for genuinely dynamic-arity row expansion that no
    built-in generator expresses (multi-output parsers, stateful
    tokenizers), and for SQL ``LATERAL`` registration parity.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield i, w

    return SplitWords
