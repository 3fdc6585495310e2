"""End-to-end KG build (SURVEY.md §3.1) — the engine's flagship entry.

Replacement for the reference's ``triple.loader -main`` CLI (load RDF
files into a repository with optional named-graph context): corpus scan
→ fingerprint → format detect → skew balance → Arrow parse → canon →
graph inject → (optional) entity linking → dedup → snapshot commit with
lineage. Stages scan→parse→canon fuse into ONE Spark stage (no shuffle
between them); the explicit shuffles are the balance repartition, the
linking joins/CC rounds, the dedup aggregate, and the bucket
repartition before write.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tripleforge import link, lineage as lineage_mod, ops
from tripleforge.catalog.base import Catalog
from tripleforge.checkpoint import filter_pending
from tripleforge.detect import with_format
from tripleforge.io import N_GRAPH_BUCKETS
from tripleforge.parse import parse_corpus, split_errors
from tripleforge.schema import STATEMENT_QUAD_KEY


@dataclass
class BuildConfig:
    graph_override: str | None = None  # CLI-style context injection (A19)
    link_entities: bool = True
    link_key_preds: list[str] = field(default_factory=list)
    max_block: int = 10_000
    # Explicit pre-parse repartition (A23). None = skip: shuffling raw
    # `content` costs more than it saves when the scan's input splits
    # are already size-bounded (spark.sql.files.maxPartitionBytes splits
    # whale repos across tasks regardless of row grouping). Set it for
    # corpora whose upstream layout is pathologically clustered.
    balance_partitions: int | None = None
    run_id: str | None = None
    resume: bool = True
    canonicalize: bool = True


@dataclass
class BuildResult:
    snapshot_id: int
    run_id: str
    n_statements: int
    n_errors: int


def compact_links(
    spark: SparkSession,
    catalog: Catalog,
    cfg: BuildConfig | None = None,
    run_id: str | None = None,
) -> BuildResult:
    """Cross-run entity-linking compaction (SURVEY §2.D10: incremental
    CC is not streamable with bounded state, so linking runs as periodic
    batch compaction over committed snapshots).

    Reads ALL live statements, resolves the full equivalence closure
    (sameAs edges may span snapshots committed by different runs),
    rewrites subjects/objects to component representatives, dedups, and
    commits the result as a full-replacement (overwrite) snapshot —
    previous snapshots stay readable via time travel.
    """
    import uuid as _uuid

    cfg = cfg or BuildConfig()
    rid = run_id or ("compact-" + _uuid.uuid4().hex)
    if catalog.latest_snapshot_id() is None:
        return BuildResult(0, rid, 0, 0)  # empty catalog → no-op
    # idempotent re-run: an already-committed run_id returns its prior
    # snapshot without recomputing the closure (and without arming the
    # observe() counter, which only resolves when a write actually runs)
    prior = catalog.read_lineage().where(F.col("run_id") == rid).limit(1).collect()
    if prior:
        r = prior[0]
        return BuildResult(int(r["snapshot_id"]), rid, int(r["n_triples"]), 0)
    live = catalog.read_statements().select(
        "subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang", "graph",
        "src_repo", "src_path", "src_commit",
    )
    edges = link.candidate_edges(live, cfg.link_key_preds, cfg.max_block)
    mapping = link.connected_components(edges)
    rewritten = ops.dedup(link.rewrite(live, mapping))
    # single-pass commit: the row count rides the snapshot write via
    # observe(), so compaction reads the live store once (VERDICT r2)
    from pyspark.sql import Observation

    obs = Observation()
    rewritten = rewritten.observe(obs, F.count(F.lit(1)).alias("n"))

    from tripleforge.update import observed_count

    def lin():
        return spark.createDataFrame(
            [("compact", None, None, 0, observed_count(obs), 0, None)],
            "parser string, repo string, commit string, n_files long, "
            "n_triples long, n_errors long, checksum string",
        ).withColumn("run_id", F.lit(rid)).withColumn(
            "committed_at", F.current_timestamp()
        )

    sid = catalog.commit_snapshot(rewritten, lin, run_id=rid, operation="overwrite")
    return BuildResult(sid, rid, observed_count(obs), 0)


def transform(
    corpus: DataFrame, cfg: BuildConfig | None = None
) -> tuple[DataFrame, DataFrame]:
    """Pure dataflow (no catalog side effects): corpus → (statements,
    errors). Used by the build, the streaming foreachBatch path, and
    tests — single source of truth for parse/canon semantics."""
    cfg = cfg or BuildConfig()
    if not cfg.balance_partitions:
        # r6: widen a narrower-than-cluster scan so the fused
        # sha256+format+parse stage uses every core; no-op when the
        # scan is already wide (guide §2.5 — measured 1-partition parse
        # at sf1.0). Applied to the RAW corpus so the fingerprint/format
        # projections land ABOVE the exchange and fuse into the wide
        # parse stage (an exchange between them would serialize the
        # sha256 onto the narrow scan as its own AQE stage — measured).
        # cores/4 (not full width): the parse feeds the dedup shuffle,
        # so fewer, larger map tasks win (guide §2.2; interleaved A/B at
        # sf1.0: narrow 0.88 s, 32-wide 1.04 s, 8-wide 0.78 s).
        dp = corpus.sparkSession.sparkContext.defaultParallelism
        corpus = ops.widen_if_narrow(corpus, target=max(min(8, dp), dp // 4))
    prepared = with_format(ops.with_sha256(corpus))
    if cfg.balance_partitions:
        # optional SHUFFLE #1 (A23 salt-and-split) — see BuildConfig
        prepared = ops.balance(prepared, cfg.balance_partitions)
    # parse + canon FUSED into one Python stage (one Arrow round-trip)
    raw = parse_corpus(prepared, canonicalize=cfg.canonicalize)
    stmts, errors = split_errors(raw)
    stmts = ops.assign_graph(stmts, cfg.graph_override)

    if cfg.link_entities:
        edges = link.candidate_edges(stmts, cfg.link_key_preds, cfg.max_block)
        mapping = link.connected_components(edges)
        stmts = link.rewrite(stmts, mapping)

    stmts = ops.dedup(stmts)  # SHUFFLE: partial+final hash agg
    return stmts, errors


def shape_for_commit(
    stmts: DataFrame, catalog: Catalog
) -> tuple[DataFrame, DataFrame]:
    """→ (unit_deduped, committable_data) — the set-semantics shaping
    shared by the batch build and the streaming foreachBatch path
    (ADVICE r1-high; one source of truth so the two ingest paths
    cannot drift).

    ``unit_deduped`` dedups WITHIN each (repo, commit) work unit, so a
    unit whose quads are fully shadowed by another unit still keeps
    rows — every parsed unit gets a lineage row and is durably marked
    committed. ``committable_data`` additionally dedups batch-globally
    and anti-joins the live store restricted to the graph buckets this
    batch touches (partition-pruned — a bounded slice of a 100 TB
    store), so appends stay set-semantic across snapshots.

    ONE explicit exchange serves both dedups: hash-partitioning on the
    quad key clusters (quad+unit) and (quad) alike, so Catalyst plans
    both HashAggregates without further shuffles (plan-audited).
    """
    stmts = stmts.repartition(*[F.col(c) for c in STATEMENT_QUAD_KEY])
    unit_deduped = ops.dedup(stmts, STATEMENT_QUAD_KEY + ["src_repo", "src_commit"])
    data = ops.dedup(unit_deduped)
    if catalog.latest_snapshot_id() is not None:
        from tripleforge.update import (
            _anti_on_quad_key,
            restrict_to_buckets,
            touched_buckets,
        )

        n_buckets = getattr(catalog, "n_buckets", N_GRAPH_BUCKETS)
        live = restrict_to_buckets(
            catalog.read_statements(), touched_buckets(data, n_buckets)
        )
        data = _anti_on_quad_key(data, live)
    return unit_deduped, data


def build(
    spark: SparkSession,
    corpus: DataFrame,
    catalog: Catalog,
    cfg: BuildConfig | None = None,
) -> BuildResult:
    """Resume-filtered build + atomic snapshot commit (A22).

    Execution-pass economics (what matters at 100 TB): the PARSE is the
    expensive stage, so its raw output (statements ∪ error rows, before
    dedup) is materialized exactly once — ``persist()`` here, a staging
    table on a real cluster — and every consumer (error metrics, lineage
    aggregation, the dedup+write) derives from that materialization.
    Without this the errors branch silently re-parses the whole corpus.
    """
    cfg = cfg or BuildConfig()
    run_id = cfg.run_id or uuid.uuid4().hex
    if cfg.resume:
        corpus = filter_pending(corpus, catalog)
        if corpus.isEmpty():
            # nothing pending → no-op, do NOT accumulate empty snapshots
            # (a scheduled re-run at production cadence would otherwise
            # grow the snapshot log unboundedly)
            sid = catalog.latest_snapshot_id() or 0
            return BuildResult(sid, run_id, 0, 0)

    if not cfg.balance_partitions:
        # r6, see transform()
        dp = corpus.sparkSession.sparkContext.defaultParallelism
        corpus = ops.widen_if_narrow(corpus, target=max(min(8, dp), dp // 4))
    prepared = with_format(ops.with_sha256(corpus))
    if cfg.balance_partitions:
        prepared = ops.balance(prepared, cfg.balance_partitions)
    raw = parse_corpus(prepared, canonicalize=cfg.canonicalize).persist()

    stmts, errors = split_errors(raw)
    stmts = ops.assign_graph(stmts, cfg.graph_override)
    if cfg.link_entities:
        edges = link.candidate_edges(stmts, cfg.link_key_preds, cfg.max_block)
        mapping = link.connected_components(edges)
        stmts = link.rewrite(stmts, mapping)

    unit_deduped, data = shape_for_commit(stmts, catalog)
    # Second staging materialization: `data` (the snapshot write) and
    # the lineage aggregation BOTH need the post-exchange unit-deduped
    # statements. Persisting it makes the lineage job a cache scan +
    # small agg instead of a second quad-key exchange + unit dedup.
    # A/B at 2M stmts/local[8] (r4): wall-NEUTRAL on this box — the
    # cache write inside the data job costs about what the recompute
    # did — but the cluster shape is strictly better: the second pass
    # burned 2× executor CPU on parse-output-sized data, while a
    # staging read is IO against an already-columnar cache.
    # (CacheManager substitutes by plan equality, so the `data` plan
    # derived above picks up this cache too.)
    unit_deduped = unit_deduped.persist()

    lin = (
        lineage_mod.collect(unit_deduped, errors)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
        .persist()
    )
    sid = catalog.commit_snapshot(data, lin, run_id=run_id)
    # totals AFTER the commit: the lineage parquet write inside
    # commit_snapshot is the action that materializes the lin cache, so
    # this agg reads the cached rows rather than forcing a pre-commit
    # job of its own (r1-r3 ordering).
    totals = lin.agg(
        F.sum("n_triples").alias("t"), F.sum("n_errors").alias("e")
    ).first()
    lin.unpersist()
    unit_deduped.unpersist()
    raw.unpersist()
    return BuildResult(sid, run_id, int(totals["t"] or 0), int(totals["e"] or 0))
