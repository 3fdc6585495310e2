"""RDF/XML parser (SURVEY.md §2.A7) — W3C RDF 1.1 XML Syntax (REC 2014).

Coverage: ``rdf:RDF`` root (or a bare node element), ``rdf:Description``
and typed node elements, ``rdf:about``/``rdf:ID``/``rdf:nodeID``,
``rdf:resource``/``rdf:datatype``, property attributes, ``xml:lang`` and
``xml:base`` inheritance, ``rdf:parseType`` Resource/Literal/Collection,
``rdf:li`` container membership (→ ``rdf:_n``), and statement
reification via ``rdf:ID`` on property elements.

Runs per-file inside the ``mapInPandas`` Arrow batch via
``xml.etree.ElementTree`` (stdlib; no external deps in the sandbox).
Reference analog: RDF4J Rio ``RDFXMLParser`` (SAX-driven); rebuilt from
the published syntax spec, not translated.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

import pandas as pd

from tripleforge.parse.common import RAW_COLS, empty_raw_frame, skolem_iri
from tripleforge.schema import (
    RDF_FIRST,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    RDF_TYPE,
    XSD_STRING,
)

_XML_NS = "http://www.w3.org/XML/1998/namespace"
_XML_LANG = f"{{{_XML_NS}}}lang"
_XML_BASE = f"{{{_XML_NS}}}base"

_RDF = lambda local: f"{{{RDF_NS}}}{local}"  # noqa: E731
_RDF_DESCRIPTION = _RDF("Description")
_RDF_ABOUT = _RDF("about")
_RDF_ID = _RDF("ID")
_RDF_NODEID = _RDF("nodeID")
_RDF_RESOURCE = _RDF("resource")
_RDF_DATATYPE = _RDF("datatype")
_RDF_PARSETYPE = _RDF("parseType")
_RDF_LI = _RDF("li")
_RDF_ROOT = _RDF("RDF")
_SYNTAX_ATTRS = {
    _RDF_ABOUT,
    _RDF_ID,
    _RDF_NODEID,
    _RDF_RESOURCE,
    _RDF_DATATYPE,
    _RDF_PARSETYPE,
    _XML_LANG,
    _XML_BASE,
}
_XMLLITERAL = RDF_NS + "XMLLiteral"
_STATEMENT = RDF_NS + "Statement"

_HAS_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class RdfXmlError(ValueError):
    pass


def _tag_iri(tag: str) -> str:
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns + local
    raise RdfXmlError(f"unqualified element {tag!r}")


class _Ctx:
    def __init__(self, repo: str, path: str):
        self.repo = repo
        self.path = path
        self.genid = 0
        self.triples: list[tuple] = []

    def bnode(self, local: str) -> str:
        return skolem_iri(self.repo, self.path, local)

    def fresh(self) -> str:
        # \x1e cannot appear in an rdf:nodeID NCName, so generated labels
        # never collide with explicit node ids (ADVICE r1).
        self.genid += 1
        return self.bnode(f"xgenid\x1e{self.genid}")

    def emit_iri(self, s: str, p: str, o: str) -> None:
        self.triples.append((s, p, o, "iri", None, None))

    def emit_lit(self, s: str, p: str, lex: str, dt: str | None, lang: str | None) -> None:
        if lang:
            self.triples.append((s, p, lex, "literal", RDF_LANGSTRING, lang.lower()))
        else:
            self.triples.append((s, p, lex, "literal", dt or XSD_STRING, None))


def _resolve(base: str, ref: str) -> str:
    if _HAS_SCHEME.match(ref):
        return ref
    if not base:
        return ref
    if ref == "":
        # RFC 3986: empty reference → base without fragment
        return base.split("#", 1)[0]
    return urljoin(base, ref)


def _node_element(ctx: _Ctx, el: ET.Element, base: str, lang: str | None) -> str:
    lang = el.get(_XML_LANG, lang)
    base = _resolve(base, el.get(_XML_BASE)) if el.get(_XML_BASE) else base
    if el.get(_RDF_ABOUT) is not None:
        subj = _resolve(base, el.get(_RDF_ABOUT))
    elif el.get(_RDF_ID) is not None:
        subj = _resolve(base, "#" + el.get(_RDF_ID))
    elif el.get(_RDF_NODEID) is not None:
        subj = ctx.bnode(el.get(_RDF_NODEID))
    else:
        subj = ctx.fresh()

    tag = _tag_iri(el.tag)
    if tag != RDF_NS + "Description":
        ctx.emit_iri(subj, RDF_TYPE, tag)

    # property attributes on the node element
    for attr, val in el.attrib.items():
        if attr in _SYNTAX_ATTRS:
            continue
        attr_iri = _tag_iri(attr)
        if attr_iri == RDF_TYPE:
            ctx.emit_iri(subj, RDF_TYPE, _resolve(base, val))
        else:
            ctx.emit_lit(subj, attr_iri, val, None, lang)

    li_counter = 0
    for child in el:
        li_counter = _property_element(ctx, subj, child, base, lang, li_counter)
    return subj


def _property_element(
    ctx: _Ctx, subj: str, el: ET.Element, base: str, lang: str | None, li_counter: int
) -> int:
    lang = el.get(_XML_LANG, lang)
    base = _resolve(base, el.get(_XML_BASE)) if el.get(_XML_BASE) else base
    tag = _tag_iri(el.tag)
    if el.tag == _RDF_LI:
        li_counter += 1
        pred = f"{RDF_NS}_{li_counter}"
    else:
        pred = tag

    parse_type = el.get(_RDF_PARSETYPE)
    reify_id = el.get(_RDF_ID)
    obj: tuple | None = None  # (value, kind, dt, lang)

    if parse_type == "Resource":
        node = ctx.fresh()
        inner_li = 0
        for child in el:
            inner_li = _property_element(ctx, node, child, base, lang, inner_li)
        obj = (node, "iri", None, None)
    elif parse_type == "Literal":
        lex = (el.text or "") + "".join(
            ET.tostring(c, encoding="unicode") for c in el
        )
        obj = (lex, "literal", _XMLLITERAL, None)
    elif parse_type == "Collection":
        items = [_node_element(ctx, c, base, lang) for c in el]
        if not items:
            obj = (RDF_NIL, "iri", None, None)
        else:
            head = ctx.fresh()
            cur = head
            for j, item in enumerate(items):
                ctx.emit_iri(cur, RDF_FIRST, item)
                if j == len(items) - 1:
                    ctx.emit_iri(cur, RDF_REST, RDF_NIL)
                else:
                    nxt = ctx.fresh()
                    ctx.emit_iri(cur, RDF_REST, nxt)
                    cur = nxt
            obj = (head, "iri", None, None)
    elif el.get(_RDF_RESOURCE) is not None:
        obj = (_resolve(base, el.get(_RDF_RESOURCE)), "iri", None, None)
    elif el.get(_RDF_NODEID) is not None:
        obj = (ctx.bnode(el.get(_RDF_NODEID)), "iri", None, None)
    elif len(el):
        children = list(el)
        if len(children) != 1:
            raise RdfXmlError(
                f"property element {pred} has {len(children)} node children"
            )
        node = _node_element(ctx, children[0], base, lang)
        obj = (node, "iri", None, None)
    else:
        prop_attrs = {
            k: v for k, v in el.attrib.items() if k not in _SYNTAX_ATTRS
        }
        if prop_attrs and not (el.text or "").strip():
            # empty property element with property attributes → bnode object
            node = ctx.fresh()
            for attr, val in prop_attrs.items():
                a_iri = _tag_iri(attr)
                if a_iri == RDF_TYPE:
                    ctx.emit_iri(node, RDF_TYPE, _resolve(base, val))
                else:
                    ctx.emit_lit(node, a_iri, val, None, lang)
            obj = (node, "iri", None, None)
        else:
            dt = el.get(_RDF_DATATYPE)
            obj = (el.text or "", "literal", dt, lang if dt is None else None)

    val, kind, dt, olang = obj
    if kind == "iri":
        ctx.emit_iri(subj, pred, val)
    else:
        ctx.emit_lit(subj, pred, val, dt, olang)

    if reify_id is not None and parse_type != "Literal":
        stmt = _resolve(base, "#" + reify_id)
        ctx.emit_iri(stmt, RDF_TYPE, _STATEMENT)
        ctx.emit_iri(stmt, RDF_NS + "subject", subj)
        ctx.emit_iri(stmt, RDF_NS + "predicate", pred)
        if kind == "iri":
            ctx.emit_iri(stmt, RDF_NS + "object", val)
        else:
            ctx.emit_lit(stmt, RDF_NS + "object", val, dt, olang)
    return li_counter


def parse_one(repo: str, path: str, content: str) -> list[tuple]:
    ctx = _Ctx(repo, path)
    root = ET.fromstring(content)
    base = ""
    if root.tag == _RDF_ROOT:
        base = root.get(_XML_BASE, "")
        lang = root.get(_XML_LANG)
        for child in root:
            _node_element(ctx, child, base, lang)
    else:
        _node_element(ctx, root, root.get(_XML_BASE, ""), root.get(_XML_LANG))
    return ctx.triples


def parse_rdfxml(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch kernel: pandas frame of (repo,path,commit,content) → RAW rows."""
    rows: list[tuple] = []
    for repo, path, commit, content in zip(
        pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
    ):
        try:
            triples = parse_one(repo, path, content)
        except (ET.ParseError, RdfXmlError, ValueError) as exc:
            rows.append(
                (None, None, None, None, None, None, None, repo, path, commit, "rdfxml", str(exc))
            )
            continue
        for s, p, o, kind, dt, lang in triples:
            rows.append(
                (s, p, o, kind, dt, lang, None, repo, path, commit, "rdfxml", None)
            )
    if not rows:
        return empty_raw_frame()
    return pd.DataFrame(rows, columns=RAW_COLS)
