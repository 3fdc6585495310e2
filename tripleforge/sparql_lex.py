"""SPARQL tokenizer + cursor (split out of sparql.py in r4 —
VERDICT r3 #6; unchanged public surface via tripleforge.sparql).

The tokenizer extends the Turtle/TriG lexer with SPARQL variables and
bare keywords; IRI constants canonicalize (A9) in pattern_term so a
query matches the store's canonical spelling.
"""

from __future__ import annotations

import re

from tripleforge.parse.ttl import _TOKEN
from tripleforge.schema import RDF_TYPE

_SPARQL_TOKEN = re.compile(
    r"(?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<STAR>\*)"
    # expression + property-path operators; '<'/'>' only where an
    # IRIREF cannot start (followed by whitespace or ')') so
    # <http://…> still lexes; '+'/'-' never eat a numeric sign
    # (INTEGER/DECIMAL/DOUBLE keep signed literals); '^' never eats
    # the '^^' datatype separator; '||' before '|'
    r"|(?P<OP>&&|\|\||<=|>=|!=|<(?=\s)|>(?=[\s)])|=|!"
    r"|\+(?![0-9.])|-(?![0-9.])|/|\^(?!\^)|\|)"
    r"|(?P<QMARK>\?)"
    r"|" + _TOKEN.pattern,
    re.VERBOSE,
)


class SparqlError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos, n = 0, len(text)
    while pos < n:
        m = _SPARQL_TOKEN.match(text, pos)
        if m is None:
            # bare keyword (SELECT, WHERE, INSERT, …) — the Turtle lexer
            # has no colon-less word token
            w = re.match(r"[A-Za-z_][A-Za-z0-9_]*", text[pos:])
            if w:
                tokens.append(("WORD", w.group()))
                pos += w.end()
                continue
            raise SparqlError(f"unexpected character {text[pos]!r} at offset {pos}")
        kind, val = m.lastgroup, m.group()
        pos = m.end()
        if kind in ("WS", "COMMENT"):
            continue
        if kind in ("PNAME", "BNODE") and val.endswith("."):
            stripped = val.rstrip(".")
            pos -= len(val) - len(stripped)
            val = stripped
        tokens.append((kind, val))
    return tokens


def _kw(tok: tuple[str, str] | None, word: str) -> bool:
    return (
        tok is not None
        and tok[0] in ("WORD", "SPARQL_KW", "GRAPHKW", "KW")
        and tok[1].upper() == word
    )


_HAS_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class _Cursor:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None

    def iri(self, raw: str) -> str:
        """Resolve a (possibly relative) IRIREF against the prologue's
        BASE (SPARQL §4.1.1 / RFC 3986); absolute IRIs pass through."""
        if self.base and not _HAS_SCHEME.match(raw):
            from urllib.parse import urljoin

            return urljoin(self.base, raw)
        return raw

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        if self.i >= len(self.toks):
            raise SparqlError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    # --- prologue ---------------------------------------------------------
    def prologue(self) -> None:
        while True:
            t = self.peek()
            if _kw(t, "PREFIX"):
                self.next()
                k, pname = self.next()
                if k != "PNAME" or not pname.endswith(":"):
                    raise SparqlError(f"bad PREFIX name {pname!r}")
                k, iritok = self.next()
                if k != "IRI":
                    raise SparqlError("PREFIX needs an IRIREF")
                self.prefixes[pname[:-1]] = self.iri(iritok[1:-1])
                continue
            if _kw(t, "BASE"):
                self.next()
                k, iritok = self.next()
                if k != "IRI":
                    raise SparqlError("BASE needs an IRIREF")
                # a BASE may itself be relative to an earlier BASE
                self.base = self.iri(iritok[1:-1])
                continue
            return

    # --- pattern terms ------------------------------------------------------
    def pattern_term(self, position: str) -> str:
        # IRI constants are canonicalized (A9) so a query written as
        # <HTTP://EX.ORG> matches the store's canonical form — the
        # RDF4J analog matches by parsed-IRI identity, not spelling
        from tripleforge.canon import normalize_iri_str

        kind, val = self.next()
        if kind == "VAR":
            return "?" + val[1:]
        if kind == "IRI":
            return normalize_iri_str(self.iri(val[1:-1]))
        if kind == "PNAME":
            ns, _, local = val.partition(":")
            if ns not in self.prefixes:
                raise SparqlError(f"undefined prefix {ns!r}:")
            return normalize_iri_str(self.prefixes[ns] + local)
        if kind == "KW" and val == "a":
            return RDF_TYPE
        if kind in ("DQ", "SQ", "LONG_DQ", "LONG_SQ"):
            lex = val[3:-3] if kind.startswith("LONG") else val[1:-1]
            nxt = self.peek()
            if nxt is not None and nxt[0] == "LANG":
                self.next()
            elif nxt is not None and nxt[0] == "DTSEP":
                self.next()
                self.next()  # datatype IRI/PNAME — matching is on lexical form
            return lex
        if kind in ("INTEGER", "DECIMAL", "DOUBLE"):
            return val
        raise SparqlError(f"bad {position} term {val!r}")


