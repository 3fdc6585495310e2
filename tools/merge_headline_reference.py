"""Composite idle-reference builder for bench.py's self-adjudication.

On a shared host a single fully-idle window for the WHOLE headline
suite may simply never occur (co-tenant bursts arrive mid-run), so the
reference applies the same best-of-all-sessions protocol as
BENCH/scaling.json — per QUERY: the reference time for each query is
the MINIMUM over every capture attempt (plus the prior reference),
i.e. the best observed idle capability. This is conservative for
regression detection: a stale-but-faster floor flags MORE candidate
regressions, never fewer; `sources` records where each minimum came
from.

    python tools/merge_headline_reference.py <label> <bench_json...>
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.path.join(REPO, "BENCH", "headline_reference.json")


def main() -> int:
    label = sys.argv[1]
    paths = sys.argv[2:]
    ref = {"sf": None, "queries": {}, "sources": {}}
    if os.path.exists(REF):
        with open(REF) as fh:
            ref = json.load(fh)
        ref.setdefault("sources", {})
        prior_tag = ref.get("captured", "prior")
        for q in ref["queries"]:
            ref["sources"].setdefault(q, prior_tag)
    for p in paths:
        with open(p) as fh:
            d = json.load(fh)
        if ref["sf"] is None:
            ref["sf"] = d["sf"]
        if d["sf"] != ref["sf"]:
            print(f"skip {p}: sf {d['sf']} != {ref['sf']}")
            continue
        tag = (
            f"{label} ({os.path.basename(p)}, load "
            f"{d.get('load_avg_start')}→{d.get('load_avg_end')})"
        )
        for q, t in d["queries"].items():
            if q not in ref["queries"] or t < ref["queries"][q]:
                ref["queries"][q] = t
                ref["sources"][q] = tag
    ref["captured"] = (
        f"composite best-of-all-sessions (latest merge: {label}); "
        "per-query provenance in `sources`"
    )
    ref["protocol"] = (
        "per-query MIN across every capture attempt + prior reference "
        "— same best-of-sessions discipline as BENCH/scaling.json; "
        "conservative for regression detection"
    )
    with open(REF, "w") as fh:
        json.dump(ref, fh, indent=2)
    print(json.dumps({"queries": ref["queries"]}, indent=0))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
