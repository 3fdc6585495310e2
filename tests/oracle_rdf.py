"""Deliberately slow, obviously-correct pure-Python oracle for the P/R
gate (SURVEY.md §5.2.7) — stands in for the unrunnable reference
(/root/reference is empty; SURVEY §0.1).

Independent implementation: character-level N-Triples/N-Quads parsing
(no shared regex with the engine), its own canonicalization (int(),
Decimal, datetime), sharing with the engine only the published
conventions: the skolem-IRI hash layout and the per-repo graph prefix
(both are spec constants of this engine, documented in SURVEY §1.2).
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from datetime import datetime, timezone
from decimal import Decimal

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_ESC = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if n == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            if n in _ESC:
                out.append(_ESC[n])
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _skolem(repo: str, path: str, local: str) -> str:
    h = hashlib.sha256(f"{repo}\x1f{path}\x1f{local}".encode()).hexdigest()
    return "urn:skolem:" + h


class _Cursor:
    def __init__(self, line: str):
        self.s = line
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t":
            self.i += 1

    def eof(self) -> bool:
        return self.i >= len(self.s)

    def term(self, repo: str, path: str):
        """→ (value, kind, dt, lang) with kind ∈ iri|literal."""
        self.ws()
        c = self.s[self.i]
        if c == "<":
            j = self.s.index(">", self.i)
            val = _unescape(self.s[self.i + 1 : j])
            self.i = j + 1
            return (val, "iri", None, None)
        if c == "_" and self.s[self.i + 1] == ":":
            j = self.i + 2
            while j < len(self.s) and self.s[j] not in " \t":
                j += 1
            local = self.s[self.i + 2 : j].rstrip(".")
            self.i = self.i + 2 + len(local)
            return (_skolem(repo, path, local), "iri", None, None)
        if c == '"':
            j = self.i + 1
            while True:
                if self.s[j] == "\\":
                    j += 2
                    continue
                if self.s[j] == '"':
                    break
                j += 1
            lex = _unescape(self.s[self.i + 1 : j])
            self.i = j + 1
            dt, lang = XSD + "string", None
            if self.s[self.i : self.i + 2] == "^^":
                self.i += 2
                assert self.s[self.i] == "<"
                j = self.s.index(">", self.i)
                dt = _unescape(self.s[self.i + 1 : j])
                self.i = j + 1
            elif self.s[self.i : self.i + 1] == "@":
                j = self.i + 1
                while j < len(self.s) and (self.s[j].isalnum() or self.s[j] == "-"):
                    j += 1
                lang = self.s[self.i + 1 : j].lower()
                dt = RDF + "langString"
                self.i = j
            return (lex, "literal", dt, lang)
        raise ValueError(f"bad term at {self.i} in {self.s!r}")


def _norm_iri(iri: str) -> str:
    """Independent RFC-3986 normalization (urllib-free, explicit)."""
    iri = unicodedata.normalize("NFC", iri)
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(.*)$", iri, re.S)
    if not m:
        m2 = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*):(.*)$", iri, re.S)
        if m2:
            return m2.group(1).lower() + ":" + _pct(m2.group(2))
        return _pct(iri)
    scheme, auth, path, qf = m.groups()
    scheme = scheme.lower()
    host, port = auth, ""
    if "@" in auth:
        ui, host = auth.rsplit("@", 1)
        ui += "@"
    else:
        ui = ""
    pm = re.match(r"^(.*?):(\d*)$", host)
    if pm:
        host, port = pm.group(1), pm.group(2)
        if port == {"http": "80", "https": "443", "ftp": "21"}.get(scheme):
            port = ""
    host = host.lower()
    # dot segments
    segs = []
    for seg in _pct(path).split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if segs and segs[-1] != "":
                segs.pop()
                if not segs:
                    segs = [""]
            continue
        segs.append(seg)
    if path.endswith(("/.", "/..")) and (not segs or segs[-1] != ""):
        segs.append("")
    p = "/".join(segs) or "/"
    return f"{scheme}://{ui}{host}{(':' + port) if port else ''}{p}{_pct(qf)}"


def _pct(s: str) -> str:
    def r(m):
        ch = chr(int(m.group(1), 16))
        if ch.isalnum() and ch.isascii() or ch in "-._~":
            return ch
        return "%" + m.group(1).upper()

    return re.sub(r"%([0-9A-Fa-f]{2})", r, s)


def _canon_lit(lex: str, dt: str):
    if dt == XSD + "integer":
        try:
            return str(int(lex))
        except ValueError:
            return lex
    if dt == XSD + "decimal":
        try:
            d = Decimal(lex)
        except Exception:
            return lex
        s = format(d.normalize(), "f")
        return s
    if dt == XSD + "double" or dt == XSD + "float":
        u = lex.strip().upper()
        if u in ("INF", "+INF", "-INF", "NAN"):
            return {"+INF": "INF", "NAN": "NaN"}.get(u, u if u != "NAN" else "NaN")
        try:
            d = Decimal(lex)
        except Exception:
            return lex
        if d == 0:
            return "-0.0E0" if d.is_signed() else "0.0E0"
        sign, digits, exp = d.as_tuple()
        ds = "".join(map(str, digits)).rstrip("0") or "0"
        e = exp + len(digits) - 1
        return ("-" if sign else "") + ds[0] + "." + (ds[1:] or "0") + "E" + str(e)
    if dt == XSD + "boolean":
        return {"0": "false", "1": "true"}.get(lex.strip(), lex.strip())
    if dt == XSD + "dateTime" and re.search(r"(Z|[+-]\d\d:\d\d)$", lex.strip()):
        try:
            d = datetime.fromisoformat(lex.strip().replace("Z", "+00:00"))
        except ValueError:
            return lex
        d = d.astimezone(timezone.utc)
        frac = (".%06d" % d.microsecond).rstrip("0") if d.microsecond else ""
        return d.strftime("%Y-%m-%dT%H:%M:%S") + frac + "Z"
    return lex


def parse_corpus_rows(rows, canonicalize: bool = True):
    """rows of (repo, path, commit, lang, content) → set of canonical
    quads (graph, subj, pred, obj, obj_kind, obj_dt, obj_lang).
    Handles N-Triples, N-Quads, and the generated structured-line TriG
    subset (GRAPH <g> { ... } blocks around N-Triples lines); other
    formats are skipped (the P/R corpus for the gate is generated
    NT/NQ/TriG)."""
    quads = set()
    for repo, path, commit, lang, content in rows:
        is_nq = (lang or "").lower().startswith("n-q") or path.endswith(".nq")
        is_nt = (lang or "").lower().startswith("n-t") or path.endswith(".nt")
        # datagen's Turtle bodies are the N-Triples subset of Turtle plus
        # @prefix directives — the oracle covers them by dropping '@' lines
        is_ttl = (lang or "").lower() == "turtle" or path.endswith(".ttl")
        is_trig = (lang or "").lower() == "trig" or path.endswith(".trig")
        if is_ttl or is_trig:
            is_nt = True
        is_trix = (lang or "").lower() == "trix" or path.endswith(".trix")
        if is_trix:
            # independent interpretation of the generated TriX shape
            # (named <graph> of <triple>s) — a plain ElementTree walk,
            # not the engine kernel; invalid XML fails whole-document on
            # both sides
            import xml.etree.ElementTree as _ET

            try:
                root = _ET.fromstring(content)
            except _ET.ParseError:
                continue
            ns = "{http://www.w3.org/2004/03/trix/trix-1/}"
            for gel in root:
                children = list(gel)
                graph = None
                start = 0
                if children and children[0].tag == ns + "uri":
                    graph = (children[0].text or "").strip()
                    start = 1
                for tel in children[start:]:
                    terms = []
                    for t in tel:
                        if t.tag == ns + "uri":
                            val = (t.text or "").strip()
                            terms.append((val, "iri", None, None))
                        elif t.tag == ns + "plainLiteral":
                            lg = t.attrib.get(
                                "{http://www.w3.org/XML/1998/namespace}lang"
                            )
                            if lg:
                                terms.append((t.text or "", "literal",
                                              RDF + "langString", lg.lower()))
                            else:
                                terms.append((t.text or "", "literal",
                                              XSD + "string", None))
                        elif t.tag == ns + "typedLiteral":
                            terms.append((t.text or "", "literal",
                                          t.attrib["datatype"], None))
                    (s, _, _, _), (p, _, _, _), (o, okind, odt, olang) = terms
                    if canonicalize:
                        s = _norm_iri(s)
                        p = _norm_iri(p)
                        if okind == "iri":
                            o = _norm_iri(o)
                        elif odt and olang is None:
                            o = _canon_lit(o, odt)
                    quads.add((graph or ("urn:repo:" + repo), s, p, o,
                               okind, odt, olang))
            continue
        is_jsonld = (lang or "").lower() == "json-ld" or path.endswith(".jsonld")
        if is_jsonld:
            # independent interpretation of the generated JSON-LD shape
            # (top-level @graph of node objects; value objects; compact
            # xsd: datatypes) — pure json walk, not the engine parser
            import json as _json

            try:
                doc = _json.loads(content)
            except ValueError:
                continue  # whole file malformed -> engine errors it too
            ctx = doc.get("@context") or {}
            prefixes = {
                k: v for k, v in ctx.items()
                if isinstance(v, str) and not k.startswith("@")
            }

            def _exp(term):
                if ":" in term:
                    pfx, _, sfx = term.partition(":")
                    if pfx in prefixes:
                        return prefixes[pfx] + sfx
                return term

            rdf_type = RDF + "type"
            graph = "urn:repo:" + repo
            for node in doc.get("@graph", []):
                subj = _norm_iri(node["@id"]) if canonicalize else node["@id"]
                for t in node.get("@type", []):
                    quads.add((graph, subj, rdf_type,
                               _norm_iri(_exp(t)) if canonicalize else _exp(t),
                               "iri", None, None))
                for k, v in node.items():
                    if k.startswith("@"):
                        continue
                    pred = _norm_iri(_exp(k)) if canonicalize else _exp(k)
                    if isinstance(v, dict) and "@id" in v:
                        o = _norm_iri(v["@id"]) if canonicalize else v["@id"]
                        quads.add((graph, subj, pred, o, "iri", None, None))
                    elif isinstance(v, dict) and "@language" in v:
                        quads.add((graph, subj, pred, v["@value"], "literal",
                                   RDF + "langString", v["@language"].lower()))
                    elif isinstance(v, dict):
                        dt = _exp(v["@type"])
                        lex = (_canon_lit(v["@value"], dt)
                               if canonicalize else v["@value"])
                        quads.add((graph, subj, pred, lex, "literal", dt, None))
                    else:
                        quads.add((graph, subj, pred, v, "literal",
                                   XSD + "string", None))
            continue
        if not (is_nt or is_nq):
            continue
        cur_graph = None  # TriG block graph, independent tracking
        for line in content.split("\n"):
            line = line.strip()
            if not line or line.startswith("#") or ((is_ttl or is_trig) and line.startswith("@")):
                continue
            if is_trig:
                m = re.match(r"^GRAPH\s+<([^>]*)>\s*\{\s*$", line, re.I)
                if m:
                    cur_graph = _unescape(m.group(1))
                    continue
                if line == "}":
                    cur_graph = None
                    continue
            try:
                cur = _Cursor(line)
                s = cur.term(repo, path)
                p = cur.term(repo, path)
                o = cur.term(repo, path)
                cur.ws()
                g = None
                if is_nq and not cur.eof() and cur.s[cur.i] in "<_":
                    g = cur.term(repo, path)
                cur.ws()
                if cur.eof() or cur.s[cur.i] != ".":
                    continue  # malformed → oracle drops, engine errors
            except (ValueError, IndexError, AssertionError):
                continue
            subj = _norm_iri(s[0]) if canonicalize else s[0]
            pred = _norm_iri(p[0]) if canonicalize else p[0]
            if o[1] == "iri":
                obj = _norm_iri(o[0]) if canonicalize else o[0]
            else:
                obj = _canon_lit(o[0], o[2]) if canonicalize else o[0]
            if g is not None:
                graph = _norm_iri(g[0]) if canonicalize else g[0]
            elif cur_graph is not None:
                graph = _norm_iri(cur_graph) if canonicalize else cur_graph
            else:
                graph = "urn:repo:" + repo
            quads.add((graph, subj, pred, obj, o[1], o[2], o[3]))
    return quads
