"""As-of (nearest-earlier) join — engine-completeness operator (SURVEY §2 J9).

Semantics: for each left row, attach the latest right row with the same key
and right_ts <= left_ts. Spark has no ASOF JOIN; the scalable dataflow is the
union trick: tag both sides, sort within key by (ts, tag), and carry the last
seen right value forward with last(..., ignorenulls) over an unbounded-
preceding window — one shuffle on the key, no range explosion, skew bounded
by the key partitioning like any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Output: all left columns + value_cols{suffix} from the
    nearest right row at-or-before the left timestamp (null if none)."""
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            l_tag.schema["_l"].dataType
        ).alias("_l"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    # right rows sort before left rows at equal ts (tag 0 < 1) => ties are
    # "at-or-before" inclusive.
    u = l_tag.unionByName(r_tag)
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = u.select(
        "_is_left",
        "_l",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_carry_{c}")
            for c in value_cols
        ],
    ).where(F.col("_is_left") == 1)
    return carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_carry_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
