"""OGR-SQL-profile relational operators as DataFrame combinators.

OGR SQL (reference grammar ogr/swq_parser.y, executor
ogr/ogrsf_frmts/generic/ogr_gensql.cpp) is a restricted dialect:
no GROUP BY, one-to-one LEFT JOINs, streaming summary aggregates,
DISTINCT lists, ORDER BY with NULLs first, LIMIT/OFFSET, UNION ALL.
These helpers reproduce the *semantics* on DataFrames; Catalyst
supplies the physics (pushdown, TakeOrderedAndProject, broadcast).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_match_left_join(
    primary: DataFrame,
    secondary: DataFrame,
    on: str,
    *,
    secondary_order: str,
    prefix: str = "sec_",
    broadcast: bool = True,
) -> DataFrame:
    """OGR SQL `LEFT JOIN ... ON a.f = b.f` is ONE-TO-ONE: each primary
    row takes the FIRST matching secondary row (nested-loop fetch,
    ogr_gensql.cpp:1497-1527; docs ogr_sql_dialect.rst:411-514).
    Spark-side: dedupe the secondary to its first row per key
    (min `secondary_order` — FID order in the reference) then plain
    left equi-join; the dedup makes Spark's hash join reproduce the
    nested-loop's first-match semantics exactly. Set broadcast=False
    for large secondaries (AQE still picks the join strategy from
    stats).
    """
    w = F.row_number().over(
        Window.partitionBy(on).orderBy(F.col(secondary_order).asc())
    )
    first = (
        secondary.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn")
    )
    renamed = first.select(
        F.col(on),
        *[F.col(c).alias(prefix + c) for c in first.columns if c != on],
    )
    return primary.join(F.broadcast(renamed) if broadcast else renamed,
                        on, "left")


def summary(df: DataFrame, col: str) -> DataFrame:
    """Whole-table summary record (SWQM_SUMMARY_RECORD,
    ogr_gensql.cpp:849 PrepareSummary): single pass, streaming
    accumulators. The reference uses Kahan sums / Welford variance
    (ogr_swq.h:357-398, swq.cpp:324-460); for integer-valued columns
    the moment form below (n*Sx2 - Sx^2 over exact int64 sums, one
    double division + one correctly-rounded sqrt) equals Welford's
    result exactly and is bit-identical across engines; float columns
    get tolerance parity (SURVEY.md §2.4)."""
    c = F.col(col)
    # moments in DECIMAL(38,0): exact far past int64, and Spark decimal
    # aggregation yields NULL (not a silent wrap) on overflow — which
    # the guard below turns into a loud error instead of a wrong stddev
    cd = c.cast("decimal(38,0)")
    agg = df.agg(
        F.count(c).alias("cnt"),
        F.countDistinct(c).alias("cnt_distinct"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
        F.sum(c).alias("sum_v"),
        F.avg(c).alias("avg_v"),
        F.sum(cd).alias("_s1"),
        F.sum(cd * cd).alias("_s2"),
    )
    n = F.col("cnt")
    m = (n.cast("decimal(38,0)") * F.col("_s2")
         - F.col("_s1") * F.col("_s1"))
    overflow = (n > 0) & m.isNull()
    err = F.raise_error(F.lit(
        "summary(): integer second moment exceeds DECIMAL(38) — "
        "cast the column to double for tolerance-parity stats"
    ))
    return agg.select(
        "cnt", "cnt_distinct", "min_v", "max_v", "sum_v", "avg_v",
        F.when(overflow, err)
        .otherwise(F.sqrt(m.cast("double") / (n * n).cast("double")))
        .alias("stddev_pop_v"),
        F.when(overflow, err)
        .otherwise(
            F.when(n > 1,
                   F.sqrt(m.cast("double") / (n * (n - 1)).cast("double")))
        ).alias("stddev_samp_v"),
    )


def distinct_list(df: DataFrame, col: str) -> DataFrame:
    """SELECT DISTINCT col (SWQM_DISTINCT_LIST, swq.cpp:388-418):
    NULLs first, then ascending — matching the reference's ordered-set
    iteration order when read sorted."""
    return df.select(col).distinct().orderBy(F.col(col).asc_nulls_first())


def order_limit_offset(df: DataFrame, order: list[tuple[str, bool]],
                       limit: int | None = None, offset: int = 0) -> DataFrame:
    """ORDER BY multi-key + LIMIT/OFFSET (ogr_gensql.cpp:2201 sort
    index; :1862-1878 limit/offset). NULLs sort first in the reference
    (ReadIndexFields) = Spark's asc_nulls_first/desc_nulls_first."""
    cols = [
        (F.col(c).asc_nulls_first() if asc else F.col(c).desc_nulls_first())
        for c, asc in order
    ]
    out = df.orderBy(*cols)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL of two SELECTs (swq_parser.y:840) — concat semantics,
    by name, missing columns null-filled (OGRUnionLayer field-map
    behavior, ogrunionlayer.cpp)."""
    return a.unionByName(b, allowMissingColumns=True)
