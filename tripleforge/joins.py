"""Specialized join strategies beyond Catalyst's built-ins (SURVEY.md
§2.B12-B13): binned range join and two as-of join implementations.

Both as-of variants have identical semantics; pick by shape:

- ``asof_join_window``: union-tag + running ``last(ignorenulls)`` —
  one shuffle, fully JVM-side. The default; scales to any size.
- ``asof_join_grouped``: ``groupBy(key).applyInPandas`` over
  ``pandas.merge_asof`` — the grouped-map surface from SURVEY §2.E,
  right when per-key groups fit in a worker and downstream wants
  pandas-side logic anyway. (Not DuckDB-oracle-expressible per group →
  rows-only check; the window variant carries the SQL oracle.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delta_us: int,
) -> DataFrame:
    """|left.ts − right.ts| ≤ max_delta within ``key`` — binned
    equi-join (bin ± 1) + residual predicate. OSS Spark has no
    range-join optimizer; this keeps the join an equi-join on
    (key, bin) so AQE/skew handling apply."""
    lbin = F.floor(F.col(left_ts) / max_delta_us)
    l = left.withColumn("_bin", lbin)
    r = right.withColumn(
        "_bin", F.explode(F.sequence(F.floor(F.col(right_ts) / max_delta_us) - 1,
                                     F.floor(F.col(right_ts) / max_delta_us) + 1))
    )
    return (
        l.join(r, [key, "_bin"])
        .where(F.abs(F.col(left_ts) - F.col(right_ts)) <= max_delta_us)
        .drop("_bin")
        .dropDuplicates()
    )


def asof_join_window(
    events: DataFrame,
    probes: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """For each probe row: latest ``value_col`` from ``events`` of the
    same key with event.ts ≤ probe.ts. Union-tag construction: events
    sort before probes at equal ts (tag 0 < 1 → '≤' semantics)."""
    e = events.select(key, ts, F.col(value_col).alias("_v"), F.lit(0).alias("_tag"))
    p = probes.withColumn("_v", F.lit(None).cast(e.schema["_v"].dataType)).withColumn(
        "_tag", F.lit(1)
    )
    missing = [c for c in p.columns if c not in e.columns]
    u = e.select(
        *e.columns, *[F.lit(None).cast(p.schema[c].dataType).alias(c) for c in missing]
    ).unionByName(p.select(*e.columns, *missing))
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(out_col, F.last("_v", ignorenulls=True).over(w))
        .where(F.col("_tag") == 1)
        .drop("_v", "_tag")
    )


def asof_join_grouped(
    events: DataFrame,
    probes: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """Same semantics via groupBy(key).applyInPandas(pd.merge_asof) —
    SURVEY §2.E grouped-map surface. One shuffle on key; each group is
    processed whole in a worker (cap group sizes upstream for whales)."""
    probe_cols = [c for c in probes.columns]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in probes.schema.fields
    ) + f", {out_col} {events.schema[value_col].dataType.simpleString()}"

    e = events.select(key, ts, F.col(value_col).alias("_ev")).withColumn(
        "_side", F.lit(0)
    )
    p = probes.withColumn("_side", F.lit(1))
    cols = sorted(set(e.columns) | set(p.columns))
    u = e.select(
        *[c if c in e.columns else F.lit(None).alias(c) for c in cols]
    ).unionByName(
        p.select(*[c if c in p.columns else F.lit(None).alias(c) for c in cols]),
        allowMissingColumns=True,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["_side"] == 0].sort_values(ts)
        pr = g[g["_side"] == 1].sort_values(ts)
        if len(pr) == 0:
            return pd.DataFrame(columns=probe_cols + [out_col])
        if len(ev) == 0:
            out = pr[probe_cols].copy()
            out[out_col] = None
            return out
        merged = pd.merge_asof(
            pr[probe_cols], ev[[ts, "_ev"]], on=ts, direction="backward"
        )
        return merged.rename(columns={"_ev": out_col})[probe_cols + [out_col]]

    return u.groupBy(key).applyInPandas(merge, out_schema)
