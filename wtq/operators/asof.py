"""As-of (backward) join — capability noted absent in the reference
(SURVEY.md §2.3 last row) but required of a general engine.

Implemented scale-first as the union + running-last-value trick: tag
both sides, union, one window over (key, ts, side) with
``last(value, ignorenulls=True)`` — a SINGLE shuffle on the join key,
no range-condition join (which Spark would execute as a broadcast
nested loop) and no per-key explosion.  Tie semantics match
``left.ts >= right.ts``: at equal ts the right row sorts first
(side 0 < 1) and is therefore visible to the left row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """For each left row, attach the `value_col` of the latest right
    row with right.ts <= left.ts and the same key.  `right` must be
    unique per (key, ts) — pre-aggregate if not."""
    vtype = right.schema[value_col].dataType
    lcols = [f.name for f in left.schema.fields]
    l2 = left.select(
        *lcols, F.lit(1).alias("__side"), F.lit(None).cast(vtype).alias("__v")
    )
    r2 = right.select(
        key,
        ts,
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in left.schema.fields
            if f.name not in (key, ts)
        ],
        F.lit(0).alias("__side"),
        F.col(value_col).alias("__v"),
    ).select(*lcols, "__side", "__v")
    u = l2.unionByName(r2)
    w = Window.partitionBy(key).orderBy(ts, "__side").rowsBetween(Window.unboundedPreceding, 0)
    return (
        u.withColumn(out_col, F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__side", "__v")
    )
