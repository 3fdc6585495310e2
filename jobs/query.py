"""Query CLI — the analog of the reference's ``sparql`` tool (read a
query, execute against the store, print tabular results), re-expressed
as triple-pattern / BGP queries over the snapshot catalog.

    python jobs/query.py --catalog /path/to/catalog \
        --pattern '?s,http://www.w3.org/1999/02/22-rdf-syntax-ns#type,?t,?g'

    python jobs/query.py --catalog /path --bgp \
        '?d,urn:p:source,?s ?d,urn:p:nchars,?n' --limit 20

    python jobs/query.py --catalog /path \
        --sparql 'SELECT ?s ?o WHERE { ?s <urn:p> ?o } LIMIT 5'
    python jobs/query.py --catalog /path --sparql-file q.rq
    python jobs/query.py --catalog /path \
        --update 'INSERT DATA { <urn:s> <urn:p> "x" . }'

Terms: ``?name`` = variable, anything else = constant, empty = unbound
(not projected). ``--snapshot`` pins a snapshot id (time travel).
``--sparql``/``--sparql-file`` execute a SPARQL SELECT string (the
reference reads its queries from files — this is that path);
``--update`` executes INSERT DATA / DELETE DATA (optional WITH <g>).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _term(t: str):
    return t if t else None


def _envelope_limit(args):
    """CLI row cap for driver-side envelopes: --no-result-cap -> None
    (explicit opt-out), --limit 0 -> library default cap, else --limit."""
    if args.no_result_cap:
        return None
    if args.limit == 0:
        from tripleforge.results import ENVELOPE_ROW_CAP

        return ENVELOPE_ROW_CAP
    return args.limit


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--pattern", help="s,p,o[,g] — one triple pattern")
    ap.add_argument("--bgp", help="space-separated list of s,p,o[,g] patterns")
    ap.add_argument("--sparql", help="SPARQL SELECT string")
    ap.add_argument("--sparql-file", help="file containing a SPARQL SELECT")
    ap.add_argument("--update", help="SPARQL INSERT DATA / DELETE DATA string")
    ap.add_argument("--snapshot", type=int, default=None)
    ap.add_argument("--limit", type=int, default=100,
                    help="row cap for show()/driver-side envelopes; "
                    "0 = uncapped (envelope formats then fall back to "
                    "ENVELOPE_ROW_CAP unless --no-result-cap)")
    ap.add_argument("--no-result-cap", action="store_true",
                    help="remove the driver-side JSON/XML envelope row "
                    "cap entirely (collects the FULL result)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--out", default=None, help="write the result to a file/dir")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of "
                    "(or before --out) executing a show()")
    ap.add_argument(
        "--format",
        default=None,
        choices=["csv", "tsv", "json", "jsonl", "xml", "nt", "nq", "ttl",
                 "trig", "jsonld-rdf", "trix", "rdfxml"],
        help="result format for --out: W3C SPARQL Results CSV/TSV/JSON/XML, "
        "distributed JSONL bindings, or N-Triples/N-Quads/Turtle/TriG/"
        "TriX/RDF-XML for statement-shaped (CONSTRUCT) results. Default: "
        "nt for CONSTRUCT, tsv for SELECT",
    )
    args = ap.parse_args()

    from tripleforge import sparql as sparql_mod
    from tripleforge.catalog import ParquetSnapshotCatalog
    from tripleforge.query import Pattern, bgp, match
    from tripleforge.session import get_spark

    spark = get_spark("tripleforge-query", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    catalog = ParquetSnapshotCatalog(spark, args.catalog)

    if args.update:
        sid = sparql_mod.execute_update(spark, catalog, args.update, run_id=args.run_id)
        print({"snapshot_id": sid})
        spark.stop()
        return 0

    stmts = catalog.read_statements(snapshot_id=args.snapshot)

    if args.sparql or args.sparql_file:
        text = args.sparql or open(args.sparql_file).read()
        result = sparql_mod.query(stmts, text, n_buckets=catalog.n_buckets)
        if args.out:
            from tripleforge.results import write_results

            is_construct = "subj" in result.columns and "pred" in result.columns
            fmt = args.format or ("nt" if is_construct else "tsv")
            write_results(result, args.out, fmt, limit=_envelope_limit(args))
            print({"written": args.out, "format": fmt})
            spark.stop()
            return 0
    elif args.pattern:
        parts = [(_term(x)) for x in args.pattern.split(",")]
        while len(parts) < 4:
            parts.append(None)
        result = match(stmts, *parts[:4], n_buckets=catalog.n_buckets)
    elif args.bgp:
        pats = []
        for p in args.bgp.split():
            parts = [(_term(x)) for x in p.split(",")]
            while len(parts) < 4:
                parts.append(None)
            pats.append(Pattern(*parts[:4]))
        result = bgp(stmts, pats, n_buckets=catalog.n_buckets)
    else:
        ap.error("need --pattern, --bgp, --sparql/--sparql-file, or --update")
        return 2

    if args.explain:
        result.explain("formatted")
    if args.out:
        from tripleforge.results import write_results

        fmt = args.format or "tsv"
        write_results(result, args.out, fmt, limit=_envelope_limit(args))
        print({"written": args.out, "format": fmt})
    elif not args.explain:
        result.show(args.limit, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
