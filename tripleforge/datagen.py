"""Deterministic synthetic RDF corpus generator (FIXTURES.md §1).

Builds rows in the mandated input shape
``(repo, path, commit, lang, content)`` from closed template pools with
``random.Random(seed)`` so expected triples are computable in closed
form by the oracle parser (tests/oracle_rdf.py). No external data.

Knobs:
- ``skew``: one "giant repo" gets ``skew``× the files — exercises
  salt-and-split (A13/A23).
- ``error_rate``: fraction of files containing a malformed line —
  exercises the error channel (A8).
- ``dup_rate``: fraction of statements duplicated across files of the
  same repo — exercises dedup (A18).
- ``link_rate``: fraction of subjects joined into cross-repo
  ``owl:sameAs`` chains — exercises linking + connected components
  (A12-A17).
- ``formats``: mix of serializations to emit.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

from tripleforge.schema import OWL_SAMEAS

_PRED_POOL = [f"http://example.org/vocab/p{i}" for i in range(20)]
_TYPE_POOL = [f"http://example.org/vocab/T{i}" for i in range(5)]
_WORD_POOL = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima",
]


@dataclass
class CorpusSpec:
    n_repos: int = 4
    files_per_repo: int = 5
    stmts_per_file: int = 20
    seed: int = 42
    skew: int = 1
    error_rate: float = 0.0
    dup_rate: float = 0.0
    link_rate: float = 0.0
    formats: tuple[str, ...] = ("nt",)
    extra: dict = field(default_factory=dict)


def _commit_of(repo: str, path: str) -> str:
    return hashlib.sha1(f"{repo}:{path}:rev0".encode()).hexdigest()


_EXT = {
    "nt": "nt", "nq": "nq", "ttl": "ttl", "trig": "trig",
    "rdfxml": "rdf", "jsonld": "jsonld", "trix": "trix",
}
_LANG = {
    "nt": "N-Triples",
    "nq": "N-Quads",
    "ttl": "Turtle",
    "trig": "TriG",
    "rdfxml": "RDF/XML",
    "jsonld": "JSON-LD",
    "trix": "TriX",
}


def _subject_iri(repo: str, i: int) -> str:
    return f"http://example.org/{repo}/e{i}"


def _mk_statement(rng: random.Random, subj: str) -> str:
    """One N-Triples line (the lingua franca; other formats are derived)."""
    pred = rng.choice(_PRED_POOL)
    kind = rng.randrange(5)
    if kind == 0:
        obj = f"<http://example.org/obj/{rng.randrange(1000)}>"
    elif kind == 1:
        obj = f'"{rng.choice(_WORD_POOL)} {rng.choice(_WORD_POOL)}"'
    elif kind == 2:
        obj = f'"{rng.randrange(10000)}"^^<http://www.w3.org/2001/XMLSchema#integer>'
    elif kind == 3:
        obj = f'"{rng.choice(_WORD_POOL)}"@en'
    else:
        pred = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        obj = f"<{rng.choice(_TYPE_POOL)}>"
    return f"<{subj}> <{pred}> {obj} ."


def _to_ttl(nt_lines: list[str]) -> str:
    # A valid Turtle document: N-Triples is a subset of Turtle; prepend a
    # no-op prefix so the Turtle code path is genuinely exercised.
    return "@prefix ex: <http://example.org/> .\n" + "\n".join(nt_lines) + "\n"


def _to_nq(nt_lines: list[str], graph: str) -> str:
    out = []
    for ln in nt_lines:
        out.append(ln[:-1].rstrip() + f" <{graph}> .")
    return "\n".join(out) + "\n"


def _to_trig(nt_lines: list[str], graph: str) -> str:
    """Equivalent TriG doc: the same statements inside a GRAPH block
    (quad context == the NQ variant's graph)."""
    body = "\n".join("  " + ln for ln in nt_lines)
    return (
        "@prefix ex: <http://example.org/> .\n"
        f"GRAPH <{graph}> {{\n{body}\n}}\n"
    )


def generate_corpus(spec: CorpusSpec) -> list[tuple[str, str, str, str, str]]:
    """→ list of (repo, path, commit, lang, content) rows."""
    rng = random.Random(spec.seed)
    rows: list[tuple[str, str, str, str, str]] = []
    repos = [f"org{i // 10}/repo{i}" for i in range(spec.n_repos)]
    link_targets: list[str] = []

    for ri, repo in enumerate(repos):
        n_files = spec.files_per_repo * (spec.skew if ri == 0 else 1)
        for fi in range(n_files):
            fmt = spec.formats[(ri + fi) % len(spec.formats)]
            path = f"data/f{fi}.{_EXT[fmt]}"
            lines = []
            for si in range(spec.stmts_per_file):
                subj = _subject_iri(repo, fi * spec.stmts_per_file + si)
                lines.append(_mk_statement(rng, subj))
                if spec.dup_rate and rng.random() < spec.dup_rate:
                    lines.append(lines[-1])
                if spec.link_rate and rng.random() < spec.link_rate:
                    if link_targets:
                        other = rng.choice(link_targets)
                        lines.append(f"<{subj}> <{OWL_SAMEAS}> <{other}> .")
                    link_targets.append(subj)
            if spec.error_rate and rng.random() < spec.error_rate:
                lines.insert(
                    rng.randrange(len(lines)), "<http://bad truncated line"
                )
            if fmt == "ttl":
                content = _to_ttl(lines)
            elif fmt == "nq":
                content = _to_nq(lines, f"http://example.org/graph/{repo}")
            elif fmt == "trig":
                content = _to_trig(lines, f"http://example.org/graph/{repo}")
            elif fmt == "rdfxml":
                content = _nt_to_rdfxml(lines)
            elif fmt == "jsonld":
                content = _nt_to_jsonld(lines)
            elif fmt == "trix":
                content = _nt_to_trix(lines, f"http://example.org/graph/{repo}")
            else:
                content = "\n".join(lines) + "\n"
            rows.append((repo, path, _commit_of(repo, path), _LANG[fmt], content))
    return rows


def _nt_to_rdfxml(nt_lines: list[str]) -> str:
    """Derive a trivially-equivalent RDF/XML doc (IRI objects → resource,
    literals → text; good lines only — errors are injected as-is)."""
    import re as _re

    pat = _re.compile(
        r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
        r"(?:\^\^<([^>]*)>|@([A-Za-z\-]+))?) \.$"
    )
    items = []
    bad = []
    for ln in nt_lines:
        m = pat.match(ln)
        if not m:
            bad.append(ln)
            continue
        s, p, o_iri, o_lit, o_dt, o_lang = m.groups()
        o_lit = _unlit(o_lit)
        ns, local = _split_iri(p)
        if o_iri is not None:
            body = f'<n:{local} xmlns:n="{ns}" rdf:resource="{o_iri}"/>'
        elif o_dt:
            body = f'<n:{local} xmlns:n="{ns}" rdf:datatype="{o_dt}">{_x(o_lit)}</n:{local}>'
        elif o_lang:
            body = f'<n:{local} xmlns:n="{ns}" xml:lang="{o_lang}">{_x(o_lit)}</n:{local}>'
        else:
            body = f'<n:{local} xmlns:n="{ns}">{_x(o_lit)}</n:{local}>'
        items.append(f'<rdf:Description rdf:about="{s}">{body}</rdf:Description>')
    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        + "".join(items)
        + "</rdf:RDF>"
    )
    if bad:
        doc = "".join(bad) + doc  # malformed XML → error channel
    return doc


def _nt_to_jsonld(nt_lines: list[str]) -> str:
    """Derive an equivalent JSON-LD document: one node object per good
    line under a top-level @graph, value objects preserving the exact
    lexical form, a @context exercising compact-IRI expansion in the
    datatype position. Injected error lines make the doc invalid JSON
    (→ the whole file lands on the error channel, matching JSON's
    document-granularity failure model)."""
    import json as _json
    import re as _re

    pat = _re.compile(
        r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
        r"(?:\^\^<([^>]*)>|@([A-Za-z\-]+))?) \.$"
    )
    nodes = []
    bad = []
    xsd = "http://www.w3.org/2001/XMLSchema#"
    for ln in nt_lines:
        m = pat.match(ln)
        if not m:
            bad.append(ln)
            continue
        s, p, o_iri, o_lit, o_dt, o_lang = m.groups()
        o_lit = _unlit(o_lit)
        node: dict = {"@id": s}
        if p == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" and o_iri:
            node["@type"] = [o_iri]
        elif o_iri is not None:
            node[p] = {"@id": o_iri}
        elif o_dt:
            dt = "xsd:" + o_dt[len(xsd):] if o_dt.startswith(xsd) else o_dt
            node[p] = {"@value": o_lit, "@type": dt}
        elif o_lang:
            node[p] = {"@value": o_lit, "@language": o_lang}
        else:
            node[p] = o_lit
        nodes.append(node)
    doc = _json.dumps(
        {"@context": {"xsd": xsd}, "@graph": nodes}, indent=1
    )
    if bad:
        doc = "".join(bad) + doc  # leading junk → invalid JSON → error
    return doc


def _nt_to_trix(nt_lines: list[str], graph: str) -> str:
    """Equivalent TriX doc: one named <graph> holding a <triple> per
    good line (quad context == the NQ/TriG variants' graph). Injected
    error lines prepend raw junk → invalid XML → the whole file lands
    on the error channel (XML's document-granularity failure model)."""
    import re as _re

    pat = _re.compile(
        r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
        r"(?:\^\^<([^>]*)>|@([A-Za-z\-]+))?) \.$"
    )
    items = []
    bad = []
    for ln in nt_lines:
        m = pat.match(ln)
        if not m:
            bad.append(ln)
            continue
        s, p, o_iri, o_lit, o_dt, o_lang = m.groups()
        o_lit = _unlit(o_lit)
        if o_iri is not None:
            obj = f"<uri>{_x(o_iri)}</uri>"
        elif o_dt:
            obj = f'<typedLiteral datatype="{_x(o_dt)}">{_x(o_lit)}</typedLiteral>'
        elif o_lang:
            obj = f'<plainLiteral xml:lang="{o_lang}">{_x(o_lit)}</plainLiteral>'
        else:
            obj = f"<plainLiteral>{_x(o_lit)}</plainLiteral>"
        items.append(
            f"<triple><uri>{_x(s)}</uri><uri>{_x(p)}</uri>{obj}</triple>"
        )
    doc = (
        '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">'
        f"<graph><uri>{_x(graph)}</uri>" + "".join(items) + "</graph></TriX>"
    )
    if bad:
        doc = "".join(bad) + doc
    return doc


def _unlit(o_lit: str | None) -> str | None:
    """NT-escaped lexical form → raw literal value (ADVICE r5: the
    converters embedded the ESCAPED form into TriX/RDF-XML/JSON-LD, so
    a literal containing \\n or \\" was semantically different across
    the format variants; the corpora never emitted escapes, so this is
    a latent-correctness fix with unchanged fixture output)."""
    if o_lit is not None and "\\" in o_lit:
        from tripleforge.parse.common import _unescape_one

        return _unescape_one(o_lit)
    return o_lit


def _split_iri(iri: str) -> tuple[str, str]:
    for sep in ("#", "/"):
        if sep in iri:
            i = iri.rindex(sep)
            return iri[: i + 1], iri[i + 1 :]
    return iri, "p"


def _x(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def corpus_df(spark, spec: CorpusSpec):
    """Spec → Spark DataFrame in the CORPUS schema."""
    from tripleforge.schema import CORPUS

    return spark.createDataFrame(generate_corpus(spec), CORPUS)


def spark_corpus(
    spark,
    n_files: int,
    stmts_per_file: int = 100,
    n_repos: int | None = None,
    skew_pct: int = 0,
):
    """Benchmark-scale deterministic corpus generated ENTIRELY JVM-side
    (spark.range + format_string/xxhash64 expressions) — the driver
    never materializes a row, so generating 10^6+ files is I/O-bound,
    not Python-bound. Content is valid N-Triples with a deterministic
    mix of IRI/plain/typed/lang objects keyed by xxhash64.

    ``skew_pct``: percentage of files forced into repo 0 (the "giant
    repo" whale for salt-and-split benchmarks).
    """
    from pyspark.sql import functions as F

    n_repos = n_repos or max(1, n_files // 50)
    fid = F.col("id")
    repo_ix = F.when(
        F.pmod(F.xxhash64(fid), 100) < skew_pct, F.lit(0)
    ).otherwise(F.pmod(F.xxhash64(fid, F.lit(1)), n_repos))

    def stmt(k):
        # deterministic per (file, k) pseudo-randomness, all JVM exprs
        h = F.xxhash64(fid, k)
        subj = F.format_string(
            "<http://example.org/r%d/e%d>", repo_ix, fid * stmts_per_file + k
        )
        pred = F.format_string(
            "<http://example.org/vocab/p%d>", F.pmod(h, 20)
        )
        obj = (
            F.when(
                F.pmod(h, 5) < 2,
                F.format_string("<http://example.org/obj/%d>", F.pmod(F.abs(h), 100000)),
            )
            .when(
                F.pmod(h, 5) == 2,
                F.format_string(
                    '"%d"^^<http://www.w3.org/2001/XMLSchema#integer>',
                    F.pmod(F.abs(h), 100000),
                ),
            )
            .when(F.pmod(h, 5) == 3, F.format_string('"lit %d"@en', F.pmod(F.abs(h), 1000)))
            .otherwise(F.format_string('"value %d"', F.pmod(F.abs(h), 100000)))
        )
        return F.concat_ws(" ", subj, pred, obj, F.lit("."))

    content = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(stmts_per_file - 1)), stmt), "\n"
    )
    return spark.range(n_files).select(
        F.format_string("org%d/repo%d", F.pmod(repo_ix, 10), repo_ix).alias("repo"),
        F.format_string("data/f%d.nt", fid).alias("path"),
        F.md5(F.format_string("f%d", fid)).alias("commit"),
        F.lit("N-Triples").alias("lang"),
        content.alias("content"),
    )
