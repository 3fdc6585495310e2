"""JSON-LD parser (SURVEY.md §2 A-family; VERDICT r3 "What's missing"
#1) — JSON-LD 1.0 expansion + Deserialize-JSON-LD-to-RDF, the subset a
KG-construction pipeline meets in the wild (schema.org-style documents).

Covered:
- inline ``@context``: object or array of objects merged left-to-right;
  term → IRI string mappings, expanded term definitions
  ``{"@id": …, "@type": "@id"|<dt>, "@language": …, "@container":
  "@list"|"@set"|"@language"|"@index", "@reverse": …}``, @id-less term
  definitions that rely on ``@vocab`` or the compact-IRI form of the
  term itself (r5, per Create Term Definition), ``@vocab``, ``@base``,
  default ``@language``, compact IRIs (``prefix:suffix``, resolved
  recursively), ``null`` term/language clearing.
- ``@reverse`` (r5): reverse term definitions and the node-object
  ``"@reverse": {prop: nodes}`` keyword — emits (object, prop, subject);
  a reverse term used inside ``@reverse`` flips back to forward.
- container maps (r5): ``@container: @language`` (lang → string(s),
  ``@none`` key → plain literal) and ``@container: @index`` (index keys
  dropped, values emitted — toRdf ignores indexes).
- node objects: ``@id`` (IRI / compact / ``_:`` blank), ``@type``
  (string or array), nested node objects (fresh deterministic blank
  node when anonymous), arrays everywhere, ``@graph`` (top-level =
  default graph; on a node with ``@id`` = that named graph).
- values: JSON strings (plain / language-tagged via term or default
  language), numbers (integral → canonical ``xsd:integer``, else
  canonical ``xsd:double`` per the toRdf algorithm), booleans →
  ``xsd:boolean``, ``null`` (dropped), value objects
  ``{"@value": …, "@type": …, "@language": …}``, node references
  ``{"@id": …}``, ``{"@list": […]}`` → rdf:first/rest/nil chains,
  ``{"@set": […]}`` → flattened.

Rejected LOUDLY (error channel, never silent): remote (string)
contexts — no network in a batch parser worker — ``@id``/``@type``
containers (JSON-LD 1.1), ``@nest``, ``@included``, ``@json``
literals, ``@direction``.

Runs per-file inside the ``mapInPandas``/``mapInArrow`` batch via the
stdlib ``json`` module — same batch shape as the RDF/XML kernel (A7).
Reference analog: RDF4J Rio ``JSONLDParser`` (public Rio format family
of jgrzebyta/triple-loader); rebuilt from the W3C JSON-LD 1.0 REC
algorithms, not translated. /root/reference is empty.
"""

from __future__ import annotations

import json
import math
import re

import pandas as pd

from tripleforge.parse.common import RAW_COLS, empty_raw_frame, skolem_iri
from tripleforge.schema import (
    RDF_FIRST,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_STRING,
)

_XSD = "http://www.w3.org/2001/XMLSchema#"
_KEYWORDS = {
    "@context", "@id", "@type", "@value", "@language", "@list", "@set",
    "@graph", "@base", "@vocab", "@container", "@reverse", "@index",
    "@nest", "@included", "@json", "@direction", "@version", "@protected",
    "@prefix",
}
_UNSUPPORTED_KEYS = {
    "@nest", "@included", "@direction",
}
_HAS_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class JsonLdError(ValueError):
    pass


def _canon_integer(v: float) -> str:
    return str(int(v))


def _canon_double(v: float) -> str:
    """Canonical xsd:double lexical form (toRdf §8.6: '%1.15E' with
    trailing zeros trimmed — '4.2E1', '1.0E0')."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "INF" if v > 0 else "-INF"
    mant, _, exp = f"{v:.15E}".partition("E")
    mant = mant.rstrip("0")
    if mant.endswith("."):
        mant += "0"
    return f"{mant}E{int(exp)}"


class _Ctx:
    """Active context: term definitions + @vocab/@base/@language."""

    __slots__ = ("terms", "vocab", "base", "language")

    def __init__(self):
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base: str = ""
        self.language: str | None = None

    def child(self) -> "_Ctx":
        c = _Ctx()
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.base = self.base
        c.language = self.language
        return c


def _apply_context(ctx: _Ctx, spec) -> _Ctx:
    """Merge one @context value (object / array / null) into a copy of
    ``ctx`` — JSON-LD 1.0 Context Processing subset."""
    if spec is None:
        return _Ctx()
    if isinstance(spec, list):
        out = ctx
        for part in spec:
            out = _apply_context(out, part)
        return out
    if isinstance(spec, str):
        raise JsonLdError(
            f"remote @context {spec!r} is not supported (no network in "
            "the parse worker) — inline the context"
        )
    if not isinstance(spec, dict):
        raise JsonLdError(f"invalid @context of type {type(spec).__name__}")
    out = ctx.child()
    if "@vocab" in spec:
        if spec["@vocab"] is not None and not isinstance(spec["@vocab"], str):
            raise JsonLdError("@vocab must be a string or null")
        out.vocab = spec["@vocab"]
    if "@base" in spec:
        if spec["@base"] is not None and not isinstance(spec["@base"], str):
            raise JsonLdError("@base must be a string or null")
        out.base = spec["@base"] or ""
    if "@language" in spec:
        if spec["@language"] is not None and not isinstance(
            spec["@language"], str
        ):
            raise JsonLdError("@language must be a string or null")
        out.language = spec["@language"]
    for term, defn in spec.items():
        if term in ("@vocab", "@base", "@language", "@version"):
            continue
        if term.startswith("@"):
            raise JsonLdError(f"cannot redefine keyword {term}")
        if defn is None:
            out.terms[term] = {"@id": None}
        elif isinstance(defn, str):
            out.terms[term] = {"@id": defn}
        elif isinstance(defn, dict):
            if "@reverse" in defn:
                bad = set(defn) - {"@reverse", "@type", "@container"}
                if bad:
                    raise JsonLdError(
                        f"unsupported reverse term definition keys "
                        f"{sorted(bad)} for {term!r}"
                    )
                if not isinstance(defn["@reverse"], str):
                    raise JsonLdError("@reverse in a term def must be a string")
                if defn.get("@type") not in (None, "@id"):
                    raise JsonLdError(
                        "a reverse term may only coerce @type: @id"
                    )
                if defn.get("@container") not in (None, "@set", "@index"):
                    raise JsonLdError("invalid reverse property @container")
                entry = {"@id": defn["@reverse"], "reverse": True}
                if defn.get("@type") == "@id":
                    entry["@type"] = "@id"
                if defn.get("@container") == "@index":
                    entry["@container"] = "@index"
                out.terms[term] = entry
                continue
            bad = set(defn) - {"@id", "@type", "@language", "@container"}
            if bad:
                raise JsonLdError(
                    f"unsupported term definition keys {sorted(bad)} "
                    f"for {term!r}"
                )
            if "@id" in defn and defn["@id"] is not None and not isinstance(
                defn["@id"], str
            ):
                raise JsonLdError(f"@id in term definition for {term!r} "
                                  "must be a string or null")
            cont = defn.get("@container")
            if cont not in (None, "@list", "@set", "@language", "@index"):
                raise JsonLdError(f"unsupported @container {cont!r}")
            out.terms[term] = dict(defn)
        else:
            raise JsonLdError(f"invalid term definition for {term!r}")
    return out


class _State:
    """Per-file emit state (deterministic blank nodes, triple sink)."""

    def __init__(self, repo: str, path: str):
        self.repo = repo
        self.path = path
        self.genid = 0
        self.triples: list[tuple] = []

    def bnode(self, local: str) -> str:
        return skolem_iri(self.repo, self.path, local)

    def fresh(self) -> str:
        # \x1e cannot appear in a JSON-LD blank-node label coming from
        # "_:<label>", so generated ids never collide with explicit ones
        self.genid += 1
        return self.bnode(f"jgenid\x1e{self.genid}")

    def emit(self, s, p, o, kind, dt, lang, graph):
        self.triples.append((s, p, o, kind, dt, lang, graph))


def _expand_iri(ctx: _Ctx, value: str, vocab: bool, _seen: frozenset = frozenset()):
    """Expand a term / compact IRI / relative IRI. ``vocab=True`` uses
    term definitions and @vocab (predicate/type position); False uses
    @base (id position). Returns None for null-mapped terms / keywords
    handled elsewhere."""
    if not isinstance(value, str):
        raise JsonLdError(
            f"expected an IRI/term string, got {type(value).__name__}"
        )
    if value in _KEYWORDS:
        return value
    if value in _seen:
        raise JsonLdError(f"cyclic term definition via {value!r}")
    if vocab and value in ctx.terms:
        entry = ctx.terms[value]
        if "@id" in entry:
            mapped = entry["@id"]
            if mapped is None:
                return None
            if mapped in _KEYWORDS:
                return mapped
            return _expand_iri(ctx, mapped, True, _seen | {value})
        # @id-less term definition (e.g. {"@type": "@id"} relying on
        # @vocab) — Create Term Definition step 14: compact-IRI-shaped
        # terms expand as compact IRIs, else @vocab + term.
        if ":" not in value:
            if ctx.vocab:
                return ctx.vocab + value
            raise JsonLdError(
                f"term {value!r} has no @id mapping and no @vocab is set"
            )
        # fall through to the compact-IRI branch below
    if value.startswith("_:"):
        return value
    if ":" in value:
        prefix, _, suffix = value.partition(":")
        if suffix.startswith("//"):
            return value  # absolute IRI like http://…
        if prefix in ctx.terms and ctx.terms[prefix].get("@id") is not None:
            base = _expand_iri(ctx, prefix, True, _seen | {value})
            return (base or "") + suffix
        if _HAS_SCHEME.match(value):
            return value
    if vocab:
        if ctx.vocab:
            return ctx.vocab + value
        return None
    if ctx.base:
        from urllib.parse import urljoin

        return urljoin(ctx.base, value)
    return value


def _to_node_id(st: _State, ctx: _Ctx, value: str) -> str:
    iri = _expand_iri(ctx, value, vocab=False)
    if iri is None:
        raise JsonLdError(f"@id {value!r} expands to null")
    if iri.startswith("_:"):
        return st.bnode(iri[2:])
    return iri


_INTEGRAL = (int,)


def _emit_value(st, ctx, subj, pred, value, tdef, graph):
    """One property value → triple(s). ``tdef`` is the (possibly empty)
    term definition controlling coercion."""
    if value is None:
        return
    cont = tdef.get("@container")
    if cont == "@language" and isinstance(value, dict) and "@value" not in value:
        # language map: {"en": "x", "de": ["y", "z"], "@none": "plain"}
        for lang in sorted(value):
            vals = value[lang]
            if not isinstance(vals, list):
                vals = [vals]
            for v in vals:
                if v is None:
                    continue
                if not isinstance(v, str):
                    raise JsonLdError(
                        "language map values must be strings, got "
                        f"{type(v).__name__} under {lang!r}"
                    )
                if lang == "@none":
                    st.emit(subj, pred, v, "literal", XSD_STRING, None, graph)
                else:
                    st.emit(subj, pred, v, "literal", RDF_LANGSTRING,
                            lang.lower(), graph)
        return
    if (
        cont == "@index"
        and isinstance(value, dict)
        and not ({"@value", "@id", "@list", "@set", "@graph"} & set(value))
    ):
        # index map: keys are data-organization only — toRdf drops them
        sub = {k: v for k, v in tdef.items() if k != "@container"}
        for idx in sorted(value):
            _emit_value(st, ctx, subj, pred, value[idx], sub, graph)
        return
    if isinstance(value, list):
        if tdef.get("@container") == "@list":
            head = _emit_list(st, ctx, value, tdef, graph)
            st.emit(subj, pred, head, "iri", None, None, graph)
            return
        for v in value:
            _emit_value(st, ctx, subj, pred, v, tdef, graph)
        return
    if isinstance(value, bool):
        st.emit(subj, pred, "true" if value else "false", "literal",
                _XSD + "boolean", None, graph)
        return
    if isinstance(value, _INTEGRAL):
        coerce = tdef.get("@type")
        if coerce and coerce not in ("@id",):
            dt = _expand_iri(ctx, coerce, True)
            st.emit(subj, pred, _canon_integer(value), "literal", dt, None, graph)
        else:
            st.emit(subj, pred, _canon_integer(value), "literal",
                    _XSD + "integer", None, graph)
        return
    if isinstance(value, float):
        if value.is_integer() and abs(value) < 1e15 and tdef.get("@type") == (
            _XSD + "integer"
        ):
            st.emit(subj, pred, _canon_integer(value), "literal",
                    _XSD + "integer", None, graph)
        else:
            st.emit(subj, pred, _canon_double(value), "literal",
                    _XSD + "double", None, graph)
        return
    if isinstance(value, str):
        coerce = tdef.get("@type")
        if coerce == "@id":
            st.emit(subj, pred, _to_node_id(st, ctx, value), "iri",
                    None, None, graph)
            return
        if coerce:
            dt = _expand_iri(ctx, coerce, True)
            st.emit(subj, pred, value, "literal", dt, None, graph)
            return
        lang = tdef["@language"] if "@language" in tdef else ctx.language
        if lang is not None and not isinstance(lang, str):
            raise JsonLdError("@language must be a string or null")
        if lang:
            st.emit(subj, pred, value, "literal", RDF_LANGSTRING,
                    lang.lower(), graph)
        else:
            st.emit(subj, pred, value, "literal", XSD_STRING, None, graph)
        return
    if isinstance(value, dict):
        if "@value" in value:
            _emit_value_object(st, ctx, subj, pred, value, graph)
            return
        if "@list" in value:
            items = value["@list"]
            if not isinstance(items, list):
                items = [items]
            head = _emit_list(st, ctx, items, tdef, graph)
            st.emit(subj, pred, head, "iri", None, None, graph)
            return
        if "@set" in value:
            _emit_value(st, ctx, subj, pred, value["@set"], tdef, graph)
            return
        # node object (or bare node reference)
        node = _node_object(st, ctx, value, graph)
        st.emit(subj, pred, node, "iri", None, None, graph)
        return
    raise JsonLdError(f"unsupported JSON value of type {type(value).__name__}")


def _emit_value_object(st, ctx, subj, pred, obj, graph):
    extra = set(obj) - {"@value", "@type", "@language", "@index"}
    if extra:
        raise JsonLdError(f"unsupported value-object keys {sorted(extra)}")
    v = obj["@value"]
    if v is None:
        return
    if "@type" in obj and "@language" in obj:
        raise JsonLdError("@type and @language are mutually exclusive")
    if "@language" in obj:
        if not isinstance(v, str):
            raise JsonLdError("@language requires a string @value")
        if not isinstance(obj["@language"], str):
            raise JsonLdError("@language must be a string")
        st.emit(subj, pred, v, "literal", RDF_LANGSTRING,
                obj["@language"].lower(), graph)
        return
    if "@type" in obj:
        dt = _expand_iri(ctx, obj["@type"], True)
        if isinstance(v, bool):
            lex = "true" if v else "false"
        elif isinstance(v, _INTEGRAL):
            lex = _canon_integer(v)
        elif isinstance(v, float):
            lex = (
                _canon_integer(v)
                if v.is_integer() and dt == _XSD + "integer"
                else _canon_double(v)
            )
        else:
            lex = v
        st.emit(subj, pred, lex, "literal", dt, None, graph)
        return
    # untyped @value → native typing rules
    if isinstance(v, bool):
        st.emit(subj, pred, "true" if v else "false", "literal",
                _XSD + "boolean", None, graph)
    elif isinstance(v, _INTEGRAL):
        st.emit(subj, pred, _canon_integer(v), "literal",
                _XSD + "integer", None, graph)
    elif isinstance(v, float):
        st.emit(subj, pred, _canon_double(v), "literal",
                _XSD + "double", None, graph)
    else:
        st.emit(subj, pred, v, "literal", XSD_STRING, None, graph)


def _emit_list(st, ctx, items, tdef, graph) -> str:
    """rdf:first/rest/nil chain; returns the head node (rdf:nil when
    empty). Item coercion reuses the term definition minus @container."""
    item_def = {k: v for k, v in tdef.items() if k != "@container"}
    flat: list = []
    for it in items:
        if it is None:
            continue
        flat.append(it)
    if not flat:
        return RDF_NIL
    head = st.fresh()
    cur = head
    for j, it in enumerate(flat):
        _emit_value(st, ctx, cur, RDF_FIRST, it, item_def, graph)
        if j == len(flat) - 1:
            st.emit(cur, RDF_REST, RDF_NIL, "iri", None, None, graph)
        else:
            nxt = st.fresh()
            st.emit(cur, RDF_REST, nxt, "iri", None, None, graph)
            cur = nxt
    return head


def _emit_reverse(st, ctx, subj, pred, value, tdef, graph):
    """Reverse property value(s) → (object, pred, subj) triples. Values
    must denote nodes (node objects, node references, or strings under
    ``@type: @id`` coercion) — literals are invalid per toRdf."""
    if value is None:
        return
    if isinstance(value, list):
        for v in value:
            _emit_reverse(st, ctx, subj, pred, v, tdef, graph)
        return
    if isinstance(value, dict):
        if "@value" in value or "@list" in value:
            raise JsonLdError(
                "reverse property values must be node objects, not "
                "literals or lists"
            )
        if "@set" in value:
            _emit_reverse(st, ctx, subj, pred, value["@set"], tdef, graph)
            return
        node = _node_object(st, ctx, value, graph)
        st.emit(node, pred, subj, "iri", None, None, graph)
        return
    if isinstance(value, str) and tdef.get("@type") == "@id":
        st.emit(_to_node_id(st, ctx, value), pred, subj, "iri", None, None,
                graph)
        return
    raise JsonLdError(
        f"invalid reverse property value of type {type(value).__name__}"
    )


def _node_object(st: _State, ctx: _Ctx, obj: dict, graph: str | None) -> str:
    """Emit a node object's triples; returns the node's term (IRI or
    skolemized blank node)."""
    if "@context" in obj:
        ctx = _apply_context(ctx, obj["@context"])
    bad = _UNSUPPORTED_KEYS & set(obj)
    if bad:
        raise JsonLdError(f"unsupported JSON-LD keys {sorted(bad)}")
    if "@id" in obj:
        if not isinstance(obj["@id"], str):
            raise JsonLdError("@id must be a string")
        subj = _to_node_id(st, ctx, obj["@id"])
    else:
        subj = st.fresh()

    types = obj.get("@type", [])
    if isinstance(types, str):
        types = [types]
    for t in types:
        t_iri = _expand_iri(ctx, t, True)
        if t_iri:
            st.emit(subj, RDF_TYPE, t_iri, "iri", None, None, graph)

    if "@graph" in obj:
        # named graph when the node has an @id; a top-level anonymous
        # {"@graph": …} wrapper keeps the current (default) graph
        inner_graph = subj if "@id" in obj else graph
        contents = obj["@graph"]
        if not isinstance(contents, list):
            contents = [contents]
        for node in contents:
            if not isinstance(node, dict):
                raise JsonLdError("@graph entries must be node objects")
            _node_object(st, ctx, node, inner_graph)

    if "@reverse" in obj:
        rev = obj["@reverse"]
        if not isinstance(rev, dict):
            raise JsonLdError("@reverse must be a map of properties")
        for rkey, rval in rev.items():
            if rkey.startswith("@"):
                raise JsonLdError("keywords are not allowed inside @reverse")
            rpred = _expand_iri(ctx, rkey, vocab=True)
            if rpred is None or rpred in _KEYWORDS:
                continue
            if rpred.startswith("_:"):
                rpred = st.bnode(rpred[2:])
            rdef = dict(ctx.terms.get(rkey, {}))
            if rdef.pop("reverse", False):
                # a reverse term inside @reverse double-flips → forward
                _emit_value(st, ctx, subj, rpred, rval, rdef, graph)
            else:
                _emit_reverse(st, ctx, subj, rpred, rval, rdef, graph)

    for key, value in obj.items():
        if key.startswith("@"):
            if key in ("@context", "@id", "@type", "@graph", "@index",
                       "@reverse"):
                continue
            raise JsonLdError(f"unsupported keyword {key} in node object")
        pred = _expand_iri(ctx, key, vocab=True)
        if pred is None or pred in _KEYWORDS:
            continue  # term not mapped to an IRI → dropped (spec)
        if pred.startswith("_:"):
            pred = st.bnode(pred[2:])
        tdef = ctx.terms.get(key, {})
        if tdef.get("reverse"):
            rdef = {k: v for k, v in tdef.items() if k != "reverse"}
            _emit_reverse(st, ctx, subj, pred, value, rdef, graph)
            continue
        _emit_value(st, ctx, subj, pred, value, tdef, graph)
    return subj


def parse_one(repo: str, path: str, content: str) -> list[tuple]:
    """One JSON-LD document → [(s, p, o, kind, dt, lang, graph)]."""
    st = _State(repo, path)
    doc = json.loads(content)
    ctx = _Ctx()
    if isinstance(doc, list):
        for node in doc:
            if not isinstance(node, dict):
                raise JsonLdError("top-level array entries must be objects")
            _node_object(st, ctx, node, None)
    elif isinstance(doc, dict):
        if "@context" in doc:
            ctx = _apply_context(ctx, doc["@context"])
        _node_object(
            st, ctx, {k: v for k, v in doc.items() if k != "@context"}, None
        )
    else:
        raise JsonLdError("JSON-LD document must be an object or array")
    return st.triples


def parse_jsonld(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch kernel: pandas frame of (repo,path,commit,content) → RAW
    rows — same shape as parse_rdfxml (A7)."""
    rows: list[tuple] = []
    for repo, path, commit, content in zip(
        pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
    ):
        try:
            triples = parse_one(repo, path, content)
        # Only data errors land on the error channel; implementation
        # bugs (KeyError/AttributeError/TypeError) must propagate so
        # the test suite sees them (ADVICE r4 #3).
        except (json.JSONDecodeError, JsonLdError) as exc:
            rows.append(
                (None, None, None, None, None, None, None,
                 repo, path, commit, "jsonld", str(exc)))
            continue
        for s, p, o, kind, dt, lang, graph in triples:
            rows.append(
                (s, p, o, kind, dt, lang, graph,
                 repo, path, commit, "jsonld", None))
    if not rows:
        return empty_raw_frame()
    return pd.DataFrame(rows, columns=RAW_COLS)
