"""TriX parser (SURVEY.md §2.A-family; VERDICT r4 next-round #4) —
the W3C member-submission XML serialization for named graphs
(HPL-2003-268, Carroll & Stickler), the remaining Rio format with
real-world incidence the engine lacked (reference analog: RDF4J Rio
``TriXParser``; /root/reference is empty — rebuilt from the published
grammar, not translated).

Grammar subset == the full TriX 1.0 core:

- root ``<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">`` with
  ``<graph>`` children (a bare top-level ``<graph>`` is tolerated);
- ``<graph>``: optional leading ``<uri>`` naming the graph (an ``<id>``
  names it with a skolemized blank node), then ``<triple>`` elements;
- ``<triple>``: exactly three term children —
  subject ∈ {``uri``, ``id``}, predicate ∈ {``uri``},
  object ∈ {``uri``, ``id``, ``plainLiteral [xml:lang]``,
  ``typedLiteral datatype="…"``}.

Literal subjects/predicates (allowed by the submission's "syntactic
extensibility", not by RDF) are rejected loudly, matching Rio. Runs
per-file inside the ``mapInPandas``/``mapInArrow`` batch via stdlib
``xml.etree.ElementTree`` — same batch shape as RDF/XML (A7).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd

from tripleforge.parse.common import RAW_COLS, empty_raw_frame, skolem_iri
from tripleforge.schema import RDF_LANGSTRING, XSD_STRING

TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"
_T = lambda local: f"{{{TRIX_NS}}}{local}"  # noqa: E731
_TRIX = _T("TriX")
_GRAPH = _T("graph")
_TRIPLE = _T("triple")
_URI = _T("uri")
_ID = _T("id")
_PLAIN = _T("plainLiteral")
_TYPED = _T("typedLiteral")
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


class TrixError(ValueError):
    pass


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _term(el: ET.Element, repo: str, path: str) -> tuple:
    """One term element → (value, kind, dt, lang)."""
    if el.tag == _URI:
        return ((el.text or "").strip(), "iri", None, None)
    if el.tag == _ID:
        label = (el.text or "").strip()
        if not label:
            raise TrixError("empty <id> blank-node label")
        return (skolem_iri(repo, path, label), "iri", None, None)
    if el.tag == _PLAIN:
        lang = el.attrib.get(_XML_LANG)
        lex = el.text or ""
        if lang:
            return (lex, "literal", RDF_LANGSTRING, lang.lower())
        return (lex, "literal", XSD_STRING, None)
    if el.tag == _TYPED:
        dt = el.attrib.get("datatype")
        if not dt:
            raise TrixError("<typedLiteral> requires a datatype attribute")
        return (el.text or "", "literal", dt, None)
    raise TrixError(f"unexpected term element <{_local(el.tag)}>")


def _graph(el: ET.Element, repo: str, path: str, sink: list[tuple]) -> None:
    children = list(el)
    graph: str | None = None
    start = 0
    if children and children[0].tag in (_URI, _ID) :
        gval, _, _, _ = _term(children[0], repo, path)
        graph = gval
        start = 1
    for child in children[start:]:
        if child.tag != _TRIPLE:
            raise TrixError(
                f"unexpected <{_local(child.tag)}> inside <graph> — only a "
                "leading name and <triple> elements are allowed"
            )
        terms = list(child)
        if len(terms) != 3:
            raise TrixError(
                f"<triple> has {len(terms)} term children, expected 3"
            )
        s, s_kind, _, _ = _term(terms[0], repo, path)
        if s_kind != "iri":
            raise TrixError("literal subjects are not valid RDF")
        if terms[1].tag != _URI:
            raise TrixError("predicates must be <uri> elements")
        p, _, _, _ = _term(terms[1], repo, path)
        o, o_kind, o_dt, o_lang = _term(terms[2], repo, path)
        sink.append((s, p, o, o_kind, o_dt, o_lang, graph))


def parse_one(repo: str, path: str, content: str) -> list[tuple]:
    """One TriX document → [(s, p, o, kind, dt, lang, graph)]."""
    root = ET.fromstring(content)
    sink: list[tuple] = []
    if root.tag == _TRIX:
        for child in root:
            if child.tag != _GRAPH:
                raise TrixError(
                    f"unexpected <{_local(child.tag)}> under <TriX>"
                )
            _graph(child, repo, path, sink)
    elif root.tag == _GRAPH:
        _graph(root, repo, path, sink)
    else:
        raise TrixError(
            f"root element <{_local(root.tag)}> is not TriX "
            f"(expected <TriX xmlns={TRIX_NS!r}>)"
        )
    return sink


def parse_trix(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch kernel: pandas frame of (repo,path,commit,content) → RAW
    rows — same shape as parse_rdfxml (A7) / parse_jsonld (A30)."""
    rows: list[tuple] = []
    for repo, path, commit, content in zip(
        pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
    ):
        try:
            triples = parse_one(repo, path, content)
        except (ET.ParseError, TrixError) as exc:
            rows.append(
                (None, None, None, None, None, None, None,
                 repo, path, commit, "trix", str(exc)))
            continue
        for s, p, o, kind, dt, lang, graph in triples:
            rows.append(
                (s, p, o, kind, dt, lang, graph,
                 repo, path, commit, "trix", None))
    if not rows:
        return empty_raw_frame()
    return pd.DataFrame(rows, columns=RAW_COLS)
