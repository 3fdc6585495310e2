"""Training-data curation CLI — the user-facing entry for the text /
embedding dedup tier (the `build.py` / `query.py` counterpart for
corpus curation; SURVEY.md training-data mandate).

Reads a parquet documents table (``doc_id``, ``text`` — column names
overridable) and/or an embeddings table (``vec_id``, ``embedding``),
runs the selected operators, and writes each result as parquet under
``--out``:

    python jobs/curate.py --docs sf/documents.parquet --out /tmp/cur \\
        --ops exact,jaccard,minhash,simhash,annotate
    python jobs/curate.py --embeddings sf/embeddings.parquet \\
        --out /tmp/cur --ops cosine --cosine-threshold 0.3

Operators:
  exact      exact duplicate groups (md5 fingerprint)        → exact/
  jaccard    shingle-Jaccard near-dup pairs ≥ threshold      → jaccard/
  minhash    MinHash+LSH near-dup pairs (verified)           → minhash/
  simhash    SimHash near-dup pairs (hamming-verified)       → simhash/
  cosine     embedding-cosine near-dup pairs (LSH-blocked)   → cosine/
  annotate   per-doc langid / quality / token counts /
             fingerprint / repetition / PII / Gopher-rule
             annotations                                     → annotate/
  redact     documents with PII-shaped spans replaced by
             typed placeholders (<EMAIL> <IP> <SSN> <PHONE>) → redact/

Prints one JSON line per operator: rows written, wall seconds, output
path — the same one-line-JSON contract as build.py.

Incremental waves (r5): every run with ``--docs`` commits a compact
``<out>/state/`` snapshot (fingerprints + MinHash signatures/buckets).
``--against <prior-out>`` dedups THIS wave against that snapshot —
``exact_incremental/`` (new docs duplicating committed docs) and
``minhash_incremental/`` (cross-wave near-dup pairs) — without ever
rescanning the prior wave's text; the new state is the union, so waves
chain:

    python jobs/curate.py --docs wave1.parquet --out /tmp/w1 --ops exact,minhash
    python jobs/curate.py --docs wave2.parquet --out /tmp/w2 \\
        --ops exact,minhash --against /tmp/w1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--docs", help="parquet path of the documents table")
    ap.add_argument("--embeddings", help="parquet path of the embeddings table")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--ops", default="exact,annotate",
                    help="comma list: exact,jaccard,minhash,simhash,cosine,"
                    "annotate,redact")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--vec-id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    ap.add_argument("--minhash-threshold", type=float, default=0.5)
    ap.add_argument("--cosine-threshold", type=float, default=0.3)
    ap.add_argument("--shingle-k", type=int, default=5)
    ap.add_argument("--n-hashes", type=int, default=32)
    ap.add_argument("--n-bands", type=int, default=8)
    ap.add_argument(
        "--against",
        help="prior curate OUTPUT dir: dedup this wave against its "
        "committed state/ snapshot (fingerprint + MinHash-bucket "
        "anti/semi joins — the prior wave's text is never rescanned); "
        "ops gain exact_incremental/ and minhash_incremental/ outputs",
    )
    ap.add_argument(
        "--no-state", action="store_true",
        help="skip writing <out>/state (the snapshot later waves join)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    ops = [o.strip() for o in args.ops.split(",") if o.strip()]
    known = {"exact", "jaccard", "minhash", "simhash", "cosine", "annotate",
             "redact"}
    bad = set(ops) - known
    if bad:
        ap.error(f"unknown ops {sorted(bad)}; pick from {sorted(known)}")
    doc_ops = {"exact", "jaccard", "minhash", "simhash", "annotate",
               "redact"} & set(ops)
    if doc_ops and not args.docs:
        ap.error(f"--docs is required for {sorted(doc_ops)}")
    if "cosine" in ops and not args.embeddings:
        ap.error("--embeddings is required for cosine")

    from pyspark.sql import functions as F

    from tripleforge import ann, text
    from tripleforge.session import get_spark

    spark = get_spark("tripleforge-curate", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(args.docs) if args.docs else None
    em = spark.read.parquet(args.embeddings) if args.embeddings else None
    i, t = args.id_col, args.text_col

    def annotate_df():
        tcol = F.col(t)
        pii = text.pii_counts(tcol)
        gopher = text.gopher_rules(tcol)
        return docs.select(
            F.col(i),
            text.langid(tcol).alias("lang"),
            text.quality_score(tcol).alias("quality"),
            text.token_count(tcol).alias("n_tokens"),
            text.bpe_ish_token_count(tcol).alias("n_subword_tokens"),
            text.fingerprint(tcol).alias("fingerprint"),
            text.repetition_ratio(tcol).alias("rep_ratio"),
            sum(pii.values()).alias("n_pii"),
            gopher["keep"].alias("gopher_keep"),
            F.round(gopher["mean_word_len"], 6).alias("mean_word_len"),
            gopher["stopword_hits"].alias("stopword_hits"),
        )

    def redact_df():
        # full pass-through of the documents table with the text column
        # scrubbed in place — one codegen projection, zero shuffles
        return docs.withColumn(t, text.redact(F.col(t)))

    from tripleforge import incremental

    prior_state = (
        os.path.join(args.against, "state") if args.against else None
    )

    builders = {
        "exact": lambda: text.exact_dedup(docs, i, t).where(F.col("n_dups") > 1),
        "jaccard": lambda: text.jaccard_pairs(
            docs, i, t, k=args.shingle_k, threshold=args.jaccard_threshold
        ),
        "minhash": lambda: text.minhash_lsh_pairs(
            docs, i, t, n_hashes=args.n_hashes, n_bands=args.n_bands,
            verify_threshold=args.minhash_threshold,
        ),
        "simhash": lambda: text.simhash_pairs(docs, i, t),
        "cosine": lambda: ann.cosine_near_dup_pairs(
            em, args.vec_id_col, args.vec_col, threshold=args.cosine_threshold
        ),
        "annotate": annotate_df,
        "redact": redact_df,
    }
    if prior_state is not None and docs is not None:
        # incremental cross-wave variants (r5): this wave vs the prior
        # run's committed state — prior TEXT is never rescanned
        if "exact" in ops:
            builders["exact_incremental"] = lambda: incremental.incremental_exact(
                docs, prior_state, i, t
            )
            ops.append("exact_incremental")
        if "minhash" in ops:
            builders["minhash_incremental"] = (
                lambda: incremental.incremental_minhash_pairs(
                    docs, prior_state, i, t,
                    n_hashes=args.n_hashes, n_bands=args.n_bands,
                    verify_threshold=args.minhash_threshold,
                )
            )
            ops.append("minhash_incremental")

    rc = 0
    for op in ops:
        dest = os.path.join(args.out, op)
        t0 = time.perf_counter()
        try:
            df = builders[op]()
            df.write.mode("overwrite").parquet(dest)
            n = spark.read.parquet(dest).count()
            print(json.dumps({
                "op": op, "rows": n, "out": dest,
                "wall_s": round(time.perf_counter() - t0, 3),
            }))
        except Exception as exc:  # keep going; report per-op failure
            rc = 1
            print(json.dumps({"op": op, "error": str(exc)[:500]}))
    if docs is not None and not args.no_state:
        # commit this wave's state (∪ prior when chaining waves) so the
        # NEXT wave can dedup against it without rescanning this text
        t0 = time.perf_counter()
        state_dir = os.path.join(args.out, "state")
        incremental.write_state(
            docs, state_dir, i, t, n_hashes=args.n_hashes,
            prior_dir=prior_state,
        )
        print(json.dumps({
            "op": "state", "out": state_dir,
            "wall_s": round(time.perf_counter() - t0, 3),
        }))
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
