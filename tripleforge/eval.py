"""Triple-match precision/recall evaluator (SURVEY.md §2.A25).

Gate from BASELINE.json: P ≥ 0.95 ∧ R ≥ 0.95 on the canonical 6-tuple
key within graph, ours vs the reference oracle (in-repo pure-Python
oracle parser — tests/oracle_rdf.py — standing in for the unrunnable
reference; SURVEY §0.1, §5.2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tripleforge.schema import STATEMENT_QUAD_KEY


def _null_safe_key(df: DataFrame) -> DataFrame:
    """obj_dt/obj_lang are legitimately null (IRI objects); equi-joins
    treat null keys as non-matching, so coalesce them to a sentinel for
    the set comparison."""
    out = df
    for c in ("obj_dt", "obj_lang"):
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("\x00null")))
    return out


def precision_recall(ours: DataFrame, oracle: DataFrame) -> tuple[float, float]:
    """Full-outer join on the quad key → (precision, recall)."""
    key = STATEMENT_QUAD_KEY
    o = _null_safe_key(ours.select(*key)).dropDuplicates().withColumn("_ours", F.lit(1))
    r = _null_safe_key(oracle.select(*key)).dropDuplicates().withColumn("_ref", F.lit(1))
    j = o.join(r, key, "full_outer").agg(
        F.sum(F.when(F.col("_ours").isNotNull() & F.col("_ref").isNotNull(), 1).otherwise(0)).alias("both"),
        F.sum(F.when(F.col("_ours").isNotNull(), 1).otherwise(0)).alias("n_ours"),
        F.sum(F.when(F.col("_ref").isNotNull(), 1).otherwise(0)).alias("n_ref"),
    )
    row = j.first()
    p = row["both"] / row["n_ours"] if row["n_ours"] else 1.0
    rcl = row["both"] / row["n_ref"] if row["n_ref"] else 1.0
    return p, rcl
