"""Triple-pattern / basic-graph-pattern query surface (SURVEY.md §3.2).

The engine's replacement for the reference's SPARQL SELECT path: a
triple pattern ``match(s, p, o, g)`` binds constants to conjunctive
filters over the statement table (pushed into the Parquet/Iceberg scan
by Catalyst); a BGP of k patterns compiles to k-1 self-equi-joins on
shared variables, ordered by a bound-term selectivity heuristic before
Catalyst/AQE take over (join strategy, reordering, broadcast).

Variables are written ``"?name"``; constants are plain strings
(IRIs/literal lexicals).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_var(term: str | None) -> bool:
    return isinstance(term, str) and term.startswith("?")


@dataclass(frozen=True)
class Pattern:
    s: str | None = None
    p: str | None = None
    o: str | None = None
    g: str | None = None
    optional: bool = False  # SPARQL OPTIONAL analog → left outer join

    @property
    def bound_count(self) -> int:
        return sum(
            1 for t in (self.s, self.p, self.o, self.g) if t is not None and not _is_var(t)
        )

    @property
    def variables(self) -> frozenset[str]:
        return frozenset(
            t[1:] for t in (self.s, self.p, self.o, self.g) if _is_var(t)
        )


def match(
    statements: DataFrame,
    s: str | None = None,
    p: str | None = None,
    o: str | None = None,
    g: str | None = None,
    carry_meta: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Single triple-pattern scan. Bound terms become sargable filters
    (column == literal → Parquet predicate pushdown + graph-bucket
    partition pruning when g is bound via the bucketed layout).

    ``carry_meta=True`` additionally projects the object term's
    kind/datatype/language as ``<var>__kind/__dt/__lang`` when the
    object position is a variable — what CONSTRUCT needs to emit
    well-typed statements from variable bindings.

    ``n_buckets`` (pass the CATALOG's bucket count — never guess) turns
    a bound graph into a ``graph_bucket == const`` partition filter on
    the bucketed layout: the scan prunes to 1/n_buckets of a 100 TB
    store (PartitionFilters in the plan)."""
    df = statements
    for col, term in (("subj", s), ("pred", p), ("obj", o), ("graph", g)):
        if term is not None and not _is_var(term):
            df = df.where(F.col(col) == F.lit(term))
            if col == "graph" and n_buckets and "graph_bucket" in df.columns:
                df = df.where(
                    F.col("graph_bucket")
                    == F.pmod(F.xxhash64(F.lit(term)), F.lit(n_buckets)).cast("int")
                )
    cols = []
    for col, term in (("subj", s), ("pred", p), ("obj", o), ("graph", g)):
        if _is_var(term):
            cols.append(F.col(col).alias(term[1:]))
            if carry_meta and col == "obj":
                v = term[1:]
                cols.append(F.col("obj_kind").alias(f"{v}__kind"))
                cols.append(F.col("obj_dt").alias(f"{v}__dt"))
                cols.append(F.col("obj_lang").alias(f"{v}__lang"))
    return df.select(*cols) if cols else df


def bgp(
    statements: DataFrame,
    patterns: list[Pattern],
    allow_cartesian: bool = False,
    carry_meta: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Basic graph pattern: join pattern scans on shared variables.

    Required patterns are ordered greedily by connectivity: seed with
    the most selective pattern (bound-term count), then repeatedly join
    the most selective REMAINING pattern that shares a variable with the
    result so far — a cheap deterministic heuristic ahead of Catalyst's
    own reordering (ADVICE r2: a pure selectivity sort falsely flagged
    fully-connected chains like ``?a p ?b . ?b q ?c . ?c r <x>`` as
    cross products). OPTIONAL patterns (SPARQL §6) join last as
    left-outer, preserving unmatched rows with null bindings. Joins are
    equi-joins on the shared variable names, so Catalyst picks
    broadcast/SMJ per AQE statistics.

    Patterns sharing no variable with ANY other reachable pattern are
    valid SPARQL (their product), but at statement-table scale an
    accidental cross product is a foot-gun, so it requires
    ``allow_cartesian=True`` (VERDICT r1).
    """
    remaining = sorted(
        range(len(patterns)),
        key=lambda i: -patterns[i].bound_count,
        # stable: ties keep textual order
    )
    remaining = [i for i in remaining if not patterns[i].optional]
    optionals = [pt for pt in patterns if pt.optional]
    result: DataFrame | None = None
    seen_vars: set[str] = set()
    while remaining:
        if result is None:
            idx = remaining.pop(0)
        else:
            # most selective remaining pattern connected to the result
            connected = [i for i in remaining if patterns[i].variables & seen_vars]
            if connected:
                idx = connected[0]
                remaining.remove(idx)
            elif allow_cartesian:
                idx = remaining.pop(0)
            else:
                raise ValueError(
                    f"BGP pattern {patterns[remaining[0]]} shares no variable "
                    "with the patterns joined so far — the result is a cross "
                    "product; pass allow_cartesian=True to run it anyway"
                )
        pt = patterns[idx]
        scan = match(
            statements, pt.s, pt.p, pt.o, pt.g,
            carry_meta=carry_meta, n_buckets=n_buckets,
        )
        seen_vars |= pt.variables
        if result is None:
            result = scan
            continue
        # a variable bound in two object positions carries meta twice —
        # the join equality makes the values identical, keep the left's
        dup_meta = [c for c in scan.columns if "__" in c and c in result.columns]
        if dup_meta:
            scan = scan.drop(*dup_meta)
        shared = [c for c in scan.columns if c in result.columns and "__" not in c]
        result = result.join(scan, on=shared, how="inner") if shared else result.crossJoin(scan)
    if result is None:
        result = statements.limit(0)
    for pt in optionals:
        scan = match(
            statements, pt.s, pt.p, pt.o, pt.g,
            carry_meta=carry_meta, n_buckets=n_buckets,
        )
        dup_meta = [c for c in scan.columns if "__" in c and c in result.columns]
        if dup_meta:
            scan = scan.drop(*dup_meta)
        shared = [c for c in scan.columns if c in result.columns and "__" not in c]
        if not shared:
            raise ValueError("OPTIONAL pattern shares no variable with the BGP")
        result = result.join(scan, on=shared, how="left")
    return result
