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
             fingerprint annotations                         → annotate/

Prints one JSON line per operator: rows written, wall seconds, output
path — the same one-line-JSON contract as build.py.
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
                    help="comma list: exact,jaccard,minhash,simhash,cosine,annotate")
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
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    ops = [o.strip() for o in args.ops.split(",") if o.strip()]
    known = {"exact", "jaccard", "minhash", "simhash", "cosine", "annotate"}
    bad = set(ops) - known
    if bad:
        ap.error(f"unknown ops {sorted(bad)}; pick from {sorted(known)}")
    doc_ops = {"exact", "jaccard", "minhash", "simhash", "annotate"} & set(ops)
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
        return docs.select(
            F.col(i),
            text.langid(tcol).alias("lang"),
            text.quality_score(tcol).alias("quality"),
            text.token_count(tcol).alias("n_tokens"),
            text.bpe_ish_token_count(tcol).alias("n_subword_tokens"),
            text.fingerprint(tcol).alias("fingerprint"),
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
    }

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
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
