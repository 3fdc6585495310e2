"""User-facing function surface beyond pyspark.sql.functions
(SURVEY.md §2.C/§2.E): grouped-aggregate pandas UDAF and map-building
helpers used by the query layer.

Rule of the house: built-in Catalyst expressions first; Arrow-batched
pandas UDFs only where built-ins genuinely can't express the semantics
(here: a weighted mean as a UDAF demonstration of the grouped-agg
surface — Spark has no built-in weighted aggregate)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-aggregate pandas UDAF: Σ(v·w)/Σ(w) per group.
    Arrow-batched; one call per group partition (map-side partials are
    not available to Python UDAFs — prefer built-ins when exactness of
    this shape isn't required)."""
    denom = weights.sum()
    return float((values * weights).sum() / denom) if denom else float("nan")


def entries_to_map(key_col: Column, value_col: Column) -> Column:
    """Map-function surface (§2.C map family): aggregate pre-grouped
    (key, value) rows into a MapType via collect_list + map_from_entries
    (keys must already be distinct within the group — ANSI mode rejects
    duplicate map keys)."""
    return F.map_from_entries(
        F.array_sort(
            F.collect_list(F.struct(key_col.alias("k"), value_col.alias("v")))
        )
    )
