"""Minimal SPARQL text front-end (SURVEY.md §3.2 ext; VERDICT r1 #5).

The reference executes SPARQL strings read from files (its ``sparql``
CLI over RDF4J); this module closes that UX gap by parsing the
high-frequency subset onto the engine's existing programmatic surface:

- ``SELECT [DISTINCT] ?v…|*|aggregates WHERE { triple patterns
  [GRAPH g {…}] [OPTIONAL {…}] [FILTER …] [VALUES ?v {…}]
  [{…} UNION {…}] } [GROUP BY] [ORDER BY] [OFFSET] [LIMIT]``
  →  :func:`tripleforge.query.bgp` (each OPTIONAL triple left-joins
  independently — exact SPARQL semantics for single-triple OPTIONAL
  groups, the common case; UNION arms union with null-padded
  variables)
- ``CONSTRUCT { template } WHERE { … }`` → typed statement output
- ``ASK { … }`` → one boolean row
- FILTER subset: ``regex(?v, "pat"[, "i"])`` and ``(?v <op> constant)``
  with ``= != < > <= >=`` (numeric constants compare numerically)
- SPARQL 1.1 Update: ``[WITH <g>] INSERT DATA / DELETE DATA { quads }``
  (TriG-parsed quad blocks), ``DELETE WHERE { patterns }``,
  the Modify form ``[DELETE {tmpl}] [INSERT {tmpl}] WHERE { patterns }``
  (one atomic snapshot, deletes-then-inserts against the pre-update
  store), and ``LOAD <uri> [INTO GRAPH <g>]`` (the reference loader's
  core operation) → :mod:`tripleforge.update` + the build pipeline

The tokenizer extends the Turtle/TriG lexer with SPARQL variables and
bare keywords; quad data inside ``{ }`` is parsed by the TriG parser
itself (same term grammar, same skolemization), so the two front-ends
can never drift apart.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

from tripleforge.parse.ttl import _TOKEN, _Parser, TurtleError, _term_to_cols
from tripleforge.query import Pattern, bgp
from tripleforge.schema import RDF_TYPE

_SPARQL_TOKEN = re.compile(
    r"(?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<STAR>\*)"
    # comparison ops for FILTER; '<'/'>' only where an IRIREF cannot
    # start (followed by whitespace or ')') so <http://…> still lexes
    r"|(?P<OP><=|>=|!=|<(?=\s)|>(?=[\s)])|=)"
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


class _Cursor:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        self.prefixes: dict[str, str] = {}

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
                self.prefixes[pname[:-1]] = iritok[1:-1]
                continue
            if _kw(t, "BASE"):
                raise SparqlError("BASE is not supported — use absolute IRIs")
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
            return normalize_iri_str(val[1:-1])
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


def _solutions(
    statements: DataFrame,
    groups: list[tuple],
    allow_cartesian: bool = False,
    carry_meta: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Union of per-group BGP solutions (SPARQL UNION: variables
    unbound in one arm come back null via allowMissingColumns)."""
    sols = []
    for patterns, filters in groups:
        sol = bgp(
            statements, patterns, allow_cartesian=allow_cartesian,
            carry_meta=carry_meta, n_buckets=n_buckets,
        )
        for spec in filters:
            sol = sol.where(_compile_filter(spec, set(sol.columns)))
        sols.append(sol)
    out = sols[0]
    for sol in sols[1:]:
        out = out.unionByName(sol, allowMissingColumns=True)
    return out


_AGG_FNS = ("COUNT", "SUM", "AVG", "MIN", "MAX")


def _parse_agg_projection(c: _Cursor) -> tuple:
    """'(' AGG '(' [DISTINCT] ?v|* ')' AS ?alias ')' →
    ("agg", fn, arg ('*' or var name), distinct, alias)."""
    c.next()  # '('
    t = c.next()
    fn = t[1].upper()
    if t[0] != "WORD" or fn not in _AGG_FNS:
        raise SparqlError(f"unsupported aggregate {t[1]!r}")
    if c.next() != ("PUNCT", "("):
        raise SparqlError(f"expected '(' after {fn}")
    distinct = False
    if _kw(c.peek(), "DISTINCT"):
        c.next()
        distinct = True
    t = c.next()
    if t[0] == "STAR":
        if fn != "COUNT":
            raise SparqlError(f"{fn}(*) is not valid SPARQL")
        arg = "*"
    elif t[0] == "VAR":
        arg = t[1][1:]
    else:
        raise SparqlError(f"bad aggregate argument {t[1]!r}")
    if c.next() != ("PUNCT", ")"):
        raise SparqlError(f"unterminated {fn}(...)")
    if not _kw(c.next(), "AS"):
        raise SparqlError("aggregate projection needs AS ?alias")
    t = c.next()
    if t[0] != "VAR":
        raise SparqlError("AS needs a variable alias")
    if c.next() != ("PUNCT", ")"):
        raise SparqlError("unterminated aggregate projection")
    return ("agg", fn, arg, distinct, t[1][1:])


def parse_select(
    text: str,
) -> tuple[list[tuple], list[tuple], dict, bool]:
    """→ (projection items, UNION groups of (patterns, filters),
    modifiers, distinct).

    Projection items are ("var", name) or the aggregate tuple from
    :func:`_parse_agg_projection`; [] means ``*``. Modifiers:
    ``{"group_by": [...], "order_by": [(var, asc)], "offset", "limit"}``.
    """
    c = _Cursor(_tokenize(text))
    c.prologue()
    if not _kw(c.peek(), "SELECT"):
        raise SparqlError("only SELECT queries are supported here")
    c.next()
    distinct = False
    if _kw(c.peek(), "DISTINCT"):
        c.next()
        distinct = True
    projected: list[tuple] = []
    while True:
        t = c.peek()
        if t is None:
            raise SparqlError("unexpected end after SELECT")
        if t[0] == "VAR":
            projected.append(("var", c.next()[1][1:]))
            continue
        if t[0] == "STAR":
            c.next()
            projected = []
            continue
        if t == ("PUNCT", "("):
            projected.append(_parse_agg_projection(c))
            continue
        break
    groups = _parse_group_pattern(c)
    mods = _parse_modifiers(c)
    return projected, groups, mods, distinct


def _parse_filter(c: _Cursor) -> tuple:
    """FILTER forms → spec tuple:
    ``FILTER regex(?v, "pat" [, "flags"])``    → ("regex", var, pat, flags)
    ``FILTER (?v <op> constant)``              → ("cmp", var, op, value, numeric)
    """
    t = c.peek()
    parens = t == ("PUNCT", "(")
    if parens:
        c.next()
        t = c.peek()
    if _kw(t, "REGEX"):
        c.next()
        if c.next() != ("PUNCT", "("):
            raise SparqlError("expected '(' after regex")
        k, v = c.next()
        if k != "VAR":
            raise SparqlError("regex() needs a variable first")
        var = v[1:]
        if c.next() != ("PUNCT", ","):
            raise SparqlError("regex() needs a pattern argument")
        k, pat = c.next()
        if k not in ("DQ", "SQ"):
            raise SparqlError("regex() pattern must be a string")
        pat = pat[1:-1]
        flags = ""
        if c.peek() == ("PUNCT", ","):
            c.next()
            k, fl = c.next()
            if k not in ("DQ", "SQ"):
                raise SparqlError("regex() flags must be a string")
            flags = fl[1:-1]
        if c.next() != ("PUNCT", ")"):
            raise SparqlError("unterminated regex()")
        spec = ("regex", var, pat, flags)
    else:
        k, v = c.next()
        if k != "VAR":
            raise SparqlError("FILTER supports (?var <op> constant) and regex()")
        var = v[1:]
        k, op = c.next()
        if k != "OP":
            raise SparqlError(f"bad FILTER operator {op!r}")
        k, val = c.next()
        if k in ("INTEGER", "DECIMAL", "DOUBLE"):
            spec = ("cmp", var, op, float(val), True)
        elif k in ("DQ", "SQ"):
            spec = ("cmp", var, op, val[1:-1], False)
        elif k == "IRI":
            spec = ("cmp", var, op, val[1:-1], False)
        else:
            raise SparqlError(f"bad FILTER constant {val!r}")
    if parens and c.next() != ("PUNCT", ")"):
        raise SparqlError("unterminated FILTER (...)")
    return spec


def _compile_filter(spec: tuple, bound: set[str]):
    from pyspark.sql import functions as F

    var = spec[1]
    if var not in bound:
        raise SparqlError(f"FILTER variable ?{var} is not bound")
    if spec[0] == "regex":
        _, _, pat, flags = spec
        if "i" in flags:
            pat = "(?i)" + pat
        return F.col(var).rlike(pat)
    if spec[0] == "in":  # VALUES ?v { ... }
        return F.col(var).isin(spec[2])
    _, _, op, val, numeric = spec
    col = F.col(var).cast("double") if numeric else F.col(var)
    ops = {
        "=": col.__eq__,
        "!=": col.__ne__,
        "<": col.__lt__,
        ">": col.__gt__,
        "<=": col.__le__,
        ">=": col.__ge__,
    }
    if op not in ops:
        raise SparqlError(f"unsupported FILTER operator {op!r}")
    return ops[op](F.lit(val))


def _parse_group_pattern(c: _Cursor) -> list[tuple[list[Pattern], list[tuple]]]:
    """WHERE { group [UNION { group }]* } where a group is triples,
    ``GRAPH g { … }``, ``OPTIONAL { … }``, ``FILTER …``, and
    ``VALUES ?v { constants }`` — shared by SELECT, CONSTRUCT, and ASK;
    stops after the closing brace (solution modifiers are parsed
    separately). Returns one (patterns, filters) per UNION arm."""
    if not _kw(c.peek(), "WHERE"):
        raise SparqlError("expected WHERE")
    c.next()
    if c.next() != ("PUNCT", "{"):
        raise SparqlError("expected '{' after WHERE")

    def parse_one_group(terminators: tuple) -> tuple[list[Pattern], list[tuple]]:
        patterns: list[Pattern] = []
        filters: list[tuple] = []

        def triples_until_close(graph_term: str | None, optional: bool = False) -> None:
            while True:
                t = c.peek()
                if t is None:
                    raise SparqlError("unterminated group pattern")
                if t == ("PUNCT", "}"):
                    c.next()
                    return
                if t == ("PUNCT", "."):
                    c.next()
                    continue
                if t[0] == "GRAPHKW" or _kw(t, "GRAPH"):
                    if graph_term is not None:
                        raise SparqlError("nested GRAPH patterns are not supported")
                    if optional:
                        raise SparqlError("GRAPH inside OPTIONAL is not supported")
                    c.next()
                    g = c.pattern_term("graph")
                    if c.next() != ("PUNCT", "{"):
                        raise SparqlError("expected '{' after GRAPH label")
                    triples_until_close(g)
                    continue
                if _kw(t, "OPTIONAL"):
                    if optional:
                        raise SparqlError("nested OPTIONAL is not supported")
                    c.next()
                    if c.next() != ("PUNCT", "{"):
                        raise SparqlError("expected '{' after OPTIONAL")
                    triples_until_close(graph_term, optional=True)
                    continue
                if _kw(t, "FILTER"):
                    c.next()
                    filters.append(_parse_filter(c))
                    continue
                if _kw(t, "VALUES"):
                    c.next()
                    k, v = c.next()
                    if k != "VAR":
                        raise SparqlError("VALUES needs a single variable here")
                    var = v[1:]
                    if c.next() != ("PUNCT", "{"):
                        raise SparqlError("expected '{' after VALUES ?var")
                    vals: list[str] = []
                    while c.peek() != ("PUNCT", "}"):
                        if c.peek() is None:
                            raise SparqlError("unterminated VALUES block")
                        vals.append(c.pattern_term("VALUES"))
                    c.next()
                    if not vals:
                        raise SparqlError("empty VALUES block")
                    filters.append(("in", var, vals))
                    continue
                s = c.pattern_term("subject")
                p = c.pattern_term("predicate")
                o = c.pattern_term("object")
                patterns.append(Pattern(s=s, p=p, o=o, g=graph_term, optional=optional))

        triples_until_close(None)
        if not patterns:
            raise SparqlError("empty group pattern")
        return patterns, filters

    # UNION chain: WHERE { { A } UNION { B } ... } — else a single group
    if c.peek() == ("PUNCT", "{"):
        groups: list[tuple[list[Pattern], list[tuple]]] = []
        while True:
            c.next()  # inner '{'
            groups.append(parse_one_group(("}",)))
            if _kw(c.peek(), "UNION"):
                c.next()
                if c.peek() != ("PUNCT", "{"):
                    raise SparqlError("expected '{' after UNION")
                continue
            break
        if c.next() != ("PUNCT", "}"):
            raise SparqlError("expected '}' to close WHERE")
        return groups
    return [parse_one_group(("}",))]


def _parse_modifiers(c: _Cursor) -> dict:
    """Solution modifiers after the group pattern: GROUP BY ?v…,
    ORDER BY [ASC|DESC](?v)…, OFFSET n, LIMIT n — consumes to end."""
    mods: dict = {"group_by": [], "order_by": [], "offset": None, "limit": None}
    if _kw(c.peek(), "GROUP"):
        c.next()
        if not _kw(c.next(), "BY"):
            raise SparqlError("expected BY after GROUP")
        while c.peek() is not None and c.peek()[0] == "VAR":
            mods["group_by"].append(c.next()[1][1:])
        if not mods["group_by"]:
            raise SparqlError("GROUP BY needs at least one variable")
    if _kw(c.peek(), "ORDER"):
        c.next()
        if not _kw(c.next(), "BY"):
            raise SparqlError("expected BY after ORDER")
        while True:
            t = c.peek()
            if t is None:
                break
            if t[0] == "VAR":
                mods["order_by"].append((c.next()[1][1:], True))
                continue
            if _kw(t, "ASC") or _kw(t, "DESC"):
                asc = t[1].upper() == "ASC"
                c.next()
                if c.next() != ("PUNCT", "("):
                    raise SparqlError("expected '(' after ASC/DESC")
                v = c.next()
                if v[0] != "VAR":
                    raise SparqlError("ASC/DESC needs a variable")
                if c.next() != ("PUNCT", ")"):
                    raise SparqlError("unterminated ASC/DESC(...)")
                mods["order_by"].append((v[1][1:], asc))
                continue
            break
        if not mods["order_by"]:
            raise SparqlError("ORDER BY needs at least one sort key")
    if _kw(c.peek(), "LIMIT"):  # SPARQL allows LIMIT/OFFSET in either order
        c.next()
        k, v = c.next()
        if k != "INTEGER":
            raise SparqlError("LIMIT needs an integer")
        mods["limit"] = int(v)
    if _kw(c.peek(), "OFFSET"):
        c.next()
        k, v = c.next()
        if k != "INTEGER":
            raise SparqlError("OFFSET needs an integer")
        mods["offset"] = int(v)
    if mods["limit"] is None and _kw(c.peek(), "LIMIT"):
        c.next()
        k, v = c.next()
        if k != "INTEGER":
            raise SparqlError("LIMIT needs an integer")
        mods["limit"] = int(v)
    if c.peek() is not None:
        raise SparqlError(f"trailing tokens after query: {c.peek()!r}")
    return mods


def _compile_agg(item: tuple):
    from pyspark.sql import functions as F

    _, fn, arg, distinct, alias = item
    if fn == "COUNT":
        if arg == "*":
            expr = F.count(F.lit(1))
        elif distinct:
            expr = F.count_distinct(F.col(arg))
        else:
            expr = F.count(F.col(arg))
        return expr.alias(alias)
    if distinct:
        raise SparqlError(f"DISTINCT is only supported in COUNT, not {fn}")
    fns = {"SUM": F.sum, "AVG": F.avg, "MIN": F.min, "MAX": F.max}
    return fns[fn](F.col(arg).cast("double")).alias(alias)


def select(
    statements: DataFrame,
    text: str,
    allow_cartesian: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Execute a SPARQL SELECT string against a statement DataFrame.

    Supports projection of variables and aggregates
    ``(COUNT/SUM/AVG/MIN/MAX(...) AS ?alias)`` with GROUP BY, plus
    ORDER BY / OFFSET / LIMIT solution modifiers. Numeric aggregates
    cast the bound lexical to double (SPARQL numeric semantics over
    this engine's string-lexical object column)."""
    projected, groups, mods, distinct = parse_select(text)
    out = _solutions(
        statements, groups, allow_cartesian=allow_cartesian, n_buckets=n_buckets
    )
    bound = set(out.columns)
    aggs = [it for it in projected if it[0] == "agg"]
    plain = [it[1] for it in projected if it[0] == "var"]
    missing = [v for v in plain if v not in bound] + [
        it[2] for it in aggs if it[2] != "*" and it[2] not in bound
    ]
    if missing:
        raise SparqlError(f"projected variables not bound: {missing}")
    if aggs or mods["group_by"]:
        group = mods["group_by"]
        stray = [v for v in plain if v not in group]
        if stray:
            raise SparqlError(
                f"non-aggregate projection {stray} must appear in GROUP BY"
            )
        bad_group = [v for v in group if v not in bound]
        if bad_group:
            raise SparqlError(f"GROUP BY variables not bound: {bad_group}")
        agg_exprs = [_compile_agg(it) for it in aggs]
        if not agg_exprs:
            raise SparqlError("GROUP BY without any aggregate projection")
        out = out.groupBy(*group).agg(*agg_exprs) if group else out.agg(*agg_exprs)
        # project in the user's order
        names = [it[1] if it[0] == "var" else it[4] for it in projected]
        out = out.select(*names)
    elif plain:
        out = out.select(*plain)
    if distinct:
        out = out.dropDuplicates()
    if mods["order_by"]:
        from pyspark.sql import functions as F

        cols = set(out.columns)
        bad = [v for v, _ in mods["order_by"] if v not in cols]
        if bad:
            raise SparqlError(f"ORDER BY variables not in projection: {bad}")
        out = out.orderBy(
            *[
                F.col(v).asc() if asc_ else F.col(v).desc()
                for v, asc_ in mods["order_by"]
            ]
        )
    if mods["offset"]:
        out = out.offset(mods["offset"])
    if mods["limit"] is not None:
        out = out.limit(mods["limit"])
    return out


def ask(
    statements: DataFrame,
    text: str,
    allow_cartesian: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """SPARQL ASK: one boolean row (column ``ask``)."""
    from pyspark.sql import functions as F

    c = _Cursor(_tokenize(text))
    c.prologue()
    if not _kw(c.peek(), "ASK"):
        raise SparqlError("expected ASK")
    c.next()
    # ASK's group pattern is WHERE-optional in SPARQL; accept both
    if not _kw(c.peek(), "WHERE"):
        c.toks.insert(c.i, ("WORD", "WHERE"))
    groups = _parse_group_pattern(c)
    _parse_modifiers(c)  # tolerate (and ignore) trailing modifiers
    sol = _solutions(
        statements, groups, allow_cartesian=allow_cartesian, n_buckets=n_buckets
    )
    return sol.limit(1).agg((F.count(F.lit(1)) > 0).alias("ask"))


def query(
    statements: DataFrame,
    text: str,
    allow_cartesian: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Dispatch a SPARQL query string: SELECT → bindings table,
    CONSTRUCT → statement-shaped DataFrame. Pass the catalog's
    ``n_buckets`` so bound-graph patterns partition-prune."""
    c = _Cursor(_tokenize(text))
    c.prologue()
    if _kw(c.peek(), "SELECT"):
        return select(statements, text, allow_cartesian=allow_cartesian, n_buckets=n_buckets)
    if _kw(c.peek(), "CONSTRUCT"):
        return construct(statements, text, allow_cartesian=allow_cartesian, n_buckets=n_buckets)
    if _kw(c.peek(), "ASK"):
        return ask(statements, text, allow_cartesian=allow_cartesian, n_buckets=n_buckets)
    raise SparqlError("only SELECT, CONSTRUCT, and ASK query forms are supported")


# ---------------------------------------------------------------------------
# CONSTRUCT
# ---------------------------------------------------------------------------
def _template_term(c: _Cursor, position: str) -> tuple:
    """Template term WITH type info: ("var", name) | ("iri", v) |
    ("lit", lex, dt, lang)."""
    from tripleforge.schema import (
        RDF_LANGSTRING,
        XSD_BOOLEAN,
        XSD_DECIMAL,
        XSD_DOUBLE,
        XSD_INTEGER,
        XSD_STRING,
    )

    kind, val = c.next()
    if kind == "VAR":
        return ("var", val[1:])
    if kind == "IRI":
        return ("iri", val[1:-1])
    if kind == "PNAME":
        ns, _, local = val.partition(":")
        if ns not in c.prefixes:
            raise SparqlError(f"undefined prefix {ns!r}:")
        return ("iri", c.prefixes[ns] + local)
    if kind == "KW" and val == "a":
        return ("iri", RDF_TYPE)
    if kind == "KW" and val in ("true", "false"):
        return ("lit", val, XSD_BOOLEAN, None)
    if kind in ("DQ", "SQ", "LONG_DQ", "LONG_SQ"):
        lex = val[3:-3] if kind.startswith("LONG") else val[1:-1]
        nxt = c.peek()
        if nxt is not None and nxt[0] == "LANG":
            c.next()
            return ("lit", lex, RDF_LANGSTRING, nxt[1][1:].lower())
        if nxt is not None and nxt[0] == "DTSEP":
            c.next()
            k, v = c.next()
            if k == "IRI":
                dt = v[1:-1]
            elif k == "PNAME":
                ns, _, local = v.partition(":")
                if ns not in c.prefixes:
                    raise SparqlError(f"undefined prefix {ns!r}:")
                dt = c.prefixes[ns] + local
            else:
                raise SparqlError(f"bad datatype {v!r}")
            return ("lit", lex, dt, None)
        return ("lit", lex, XSD_STRING, None)
    if kind == "INTEGER":
        return ("lit", val, XSD_INTEGER, None)
    if kind == "DECIMAL":
        return ("lit", val, XSD_DECIMAL, None)
    if kind == "DOUBLE":
        return ("lit", val, XSD_DOUBLE, None)
    raise SparqlError(f"bad template {position} term {val!r} (bnodes unsupported)")


def parse_construct(
    text: str,
) -> tuple[list[tuple], list[tuple], int | None]:
    """→ (template triples, UNION groups, limit)."""
    c = _Cursor(_tokenize(text))
    c.prologue()
    if not _kw(c.peek(), "CONSTRUCT"):
        raise SparqlError("expected CONSTRUCT")
    c.next()
    if c.next() != ("PUNCT", "{"):
        raise SparqlError("expected '{' after CONSTRUCT")
    template: list[tuple] = []
    while True:
        t = c.peek()
        if t is None:
            raise SparqlError("unterminated CONSTRUCT template")
        if t == ("PUNCT", "}"):
            c.next()
            break
        if t == ("PUNCT", "."):
            c.next()
            continue
        s = _template_term(c, "subject")
        p = _template_term(c, "predicate")
        o = _template_term(c, "object")
        template.append((s, p, o, None))
    if not template:
        raise SparqlError("empty CONSTRUCT template")
    groups = _parse_group_pattern(c)
    mods = _parse_modifiers(c)
    if mods["group_by"] or mods["order_by"] or mods["offset"]:
        raise SparqlError("CONSTRUCT supports only the LIMIT modifier")
    return template, groups, mods["limit"]


def construct(
    statements: DataFrame,
    text: str,
    allow_cartesian: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Execute a SPARQL CONSTRUCT string → statement-shaped DataFrame
    (subj, pred, obj, obj_kind, obj_dt, obj_lang, graph). Pair with
    :func:`tripleforge.io.write_ntriples` for serialized output — the
    reference's CONSTRUCT-to-file path."""
    from pyspark.sql import functions as F

    template, groups, limit = parse_construct(text)
    sol = _solutions(
        statements, groups, allow_cartesian=allow_cartesian,
        carry_meta=True, n_buckets=n_buckets,
    )
    if limit is not None:
        sol = sol.limit(limit)
    return _instantiate(sol, template, default_graph=None)


def _instantiate(
    sol: DataFrame, template: list[tuple], default_graph: str | None
) -> DataFrame:
    """Instantiate a (s, p, o, g) template against solution rows →
    statement-shaped DataFrame. Variable objects carry their
    kind/datatype/language from the matched statements (carry_meta);
    a None graph term falls back to ``default_graph`` (WITH <g>)."""
    from pyspark.sql import functions as F

    bound = set(sol.columns)

    def resolve(term: tuple, position: str):
        if term[0] == "var":
            if term[1] not in bound:
                raise SparqlError(f"template variable ?{term[1]} is not bound")
            return F.col(term[1])
        return F.lit(term[1])

    parts = []
    for s, p, o, g in template:
        cols = [
            resolve(s, "subject").alias("subj"),
            resolve(p, "predicate").alias("pred"),
            resolve(o, "object").alias("obj"),
        ]
        if o[0] == "var":
            v = o[1]
            has_meta = f"{v}__kind" in bound
            cols += [
                (F.coalesce(F.col(f"{v}__kind"), F.lit("iri")) if has_meta else F.lit("iri")).alias("obj_kind"),
                (F.col(f"{v}__dt") if has_meta else F.lit(None).cast("string")).alias("obj_dt"),
                (F.col(f"{v}__lang") if has_meta else F.lit(None).cast("string")).alias("obj_lang"),
            ]
        elif o[0] == "iri":
            cols += [
                F.lit("iri").alias("obj_kind"),
                F.lit(None).cast("string").alias("obj_dt"),
                F.lit(None).cast("string").alias("obj_lang"),
            ]
        else:
            _, _, dt, lang = o
            cols += [
                F.lit("literal").alias("obj_kind"),
                F.lit(dt).alias("obj_dt"),
                (F.lit(lang) if lang else F.lit(None).cast("string")).alias("obj_lang"),
            ]
        if g is not None:
            cols.append(resolve(g, "graph").alias("graph"))
        else:
            cols.append(F.lit(default_graph).cast("string").alias("graph"))
        part = sol.select(*cols)
        # SPARQL: a solution leaving any template term unbound (e.g. an
        # OPTIONAL/UNION variable bound to null) produces NO statement
        part = part.where(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        if g is not None and g[0] == "var":
            part = part.where(F.col("graph").isNotNull())
        parts.append(part)
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.dropDuplicates()  # templates yield statement SETS


# ---------------------------------------------------------------------------
# INSERT DATA / DELETE DATA
# ---------------------------------------------------------------------------
def parse_update(text: str) -> tuple[str, str | None, list[tuple]]:
    """→ (op ∈ {insert, delete}, WITH graph or None, statement rows).

    Rows are ``(subj, pred, obj, obj_kind, obj_dt, obj_lang, graph)``
    with TriG-style GRAPH blocks honored inside the data block and
    blank nodes skolemized deterministically on the update text hash.
    """
    toks = _tokenize(text)
    c = _Cursor(toks)
    c.prologue()
    with_graph = None
    if _kw(c.peek(), "WITH"):
        c.next()
        k, v = c.next()
        if k != "IRI":
            raise SparqlError("WITH needs an IRIREF")
        with_graph = v[1:-1]
    t = c.next()
    if _kw(t, "INSERT"):
        op = "insert"
    elif _kw(t, "DELETE"):
        op = "delete"
    else:
        raise SparqlError(f"expected INSERT or DELETE, got {t!r}")
    if not _kw(c.next(), "DATA"):
        raise SparqlError("only INSERT DATA / DELETE DATA are supported")
    if c.next() != ("PUNCT", "{"):
        raise SparqlError("expected '{' after DATA")
    # find the matching close brace (quad data may contain GRAPH blocks)
    depth, start = 1, c.i
    while depth:
        t = c.next()
        if t == ("PUNCT", "{"):
            depth += 1
        elif t == ("PUNCT", "}"):
            depth -= 1
    inner = toks[start : c.i - 1]
    if c.peek() is not None:
        raise SparqlError(f"trailing tokens after update: {c.peek()!r}")
    # the data block IS TriG — reuse the TriG parser (same term grammar,
    # same deterministic skolemization keyed on the update text)
    key = hashlib.sha256(text.encode("utf-8")).hexdigest()[:16]
    p = _Parser(inner, "urn:sparql-update", key, trig=True)
    p.prefixes.update(c.prefixes)
    try:
        p.parse()
    except TurtleError as exc:
        raise SparqlError(f"bad quad data: {exc}") from exc
    rows = []
    for s, pr, o, g in p.triples:
        sv = _term_to_cols(s, "urn:sparql-update", key)[0]
        pv = _term_to_cols(pr, "urn:sparql-update", key)[0]
        ov, okind, odt, olang = _term_to_cols(o, "urn:sparql-update", key)
        gv = _term_to_cols(g, "urn:sparql-update", key)[0] if g is not None else None
        rows.append((sv, pv, ov, okind, odt, olang, gv))
    if not rows:
        raise SparqlError("empty data block")
    return op, with_graph, rows


def _graph_term(c: _Cursor) -> tuple:
    k, v = c.next()
    if k == "VAR":
        return ("var", v[1:])
    if k == "IRI":
        return ("iri", v[1:-1])
    if k == "PNAME":
        ns, _, local = v.partition(":")
        if ns not in c.prefixes:
            raise SparqlError(f"undefined prefix {ns!r}:")
        return ("iri", c.prefixes[ns] + local)
    raise SparqlError(f"bad graph term {v!r}")


def _parse_template_block(c: _Cursor) -> list[tuple]:
    """'{' (triples | GRAPH g '{' triples '}')* '}' → template quads
    (s, p, o, g_term|None) — the DELETE/INSERT clause templates of the
    SPARQL 1.1 Modify form."""
    if c.next() != ("PUNCT", "{"):
        raise SparqlError("expected '{' to open a template")
    out: list[tuple] = []

    def triples(g: tuple | None) -> None:
        while True:
            t = c.peek()
            if t is None:
                raise SparqlError("unterminated template")
            if t == ("PUNCT", "}"):
                c.next()
                return
            if t == ("PUNCT", "."):
                c.next()
                continue
            if t[0] == "GRAPHKW" or _kw(t, "GRAPH"):
                if g is not None:
                    raise SparqlError("nested GRAPH in template")
                c.next()
                gt = _graph_term(c)
                if c.next() != ("PUNCT", "{"):
                    raise SparqlError("expected '{' after GRAPH label")
                triples(gt)
                continue
            s = _template_term(c, "subject")
            p = _template_term(c, "predicate")
            o = _template_term(c, "object")
            out.append((s, p, o, g))

    triples(None)
    if not out:
        raise SparqlError("empty template")
    return out


def _delete_where_compile(
    patterns: list[Pattern], with_graph: str | None
) -> tuple[list[Pattern], list[tuple], list[tuple]]:
    """DELETE WHERE: the pattern block doubles as the delete template.
    Constant objects are rebound through synthetic variables (equality
    filters) so the deleted statements carry their true
    kind/datatype/language; unset graphs bind a synthetic graph
    variable so the matched statement's actual graph is deleted."""
    new_patterns: list[Pattern] = []
    template: list[tuple] = []
    extra_filters: list[tuple] = []
    for i, pt in enumerate(patterns):
        if pt.optional:
            raise SparqlError("OPTIONAL is not allowed in DELETE WHERE")
        s_t = ("var", pt.s[1:]) if _is_tvar(pt.s) else ("iri", pt.s)
        p_t = ("var", pt.p[1:]) if _is_tvar(pt.p) else ("iri", pt.p)
        if _is_tvar(pt.o):
            o_pat, o_t = pt.o, ("var", pt.o[1:])
        else:
            o_pat = f"?__o{i}"
            o_t = ("var", f"__o{i}")
            extra_filters.append(("cmp", f"__o{i}", "=", pt.o, False))
        if pt.g is None:
            if with_graph is None:
                g_pat, g_t = f"?__g{i}", ("var", f"__g{i}")
            else:
                g_pat, g_t = with_graph, ("iri", with_graph)
        elif _is_tvar(pt.g):
            g_pat, g_t = pt.g, ("var", pt.g[1:])
        else:
            g_pat, g_t = pt.g, ("iri", pt.g)
        new_patterns.append(Pattern(s=pt.s, p=pt.p, o=o_pat, g=g_pat))
        template.append((s_t, p_t, o_t, g_t))
    return new_patterns, template, extra_filters


def _is_tvar(term: str | None) -> bool:
    return isinstance(term, str) and term.startswith("?")


def execute_update(
    spark: SparkSession, catalog, text: str, run_id: str | None = None
) -> int:
    """Parse and execute one SPARQL 1.1 update string against the
    catalog; returns the committed snapshot id. Forms:

    - ``[WITH <g>] INSERT DATA { quads }`` / ``DELETE DATA { quads }``
    - ``[WITH <g>] DELETE WHERE { patterns }``
    - ``[WITH <g>] [DELETE {tmpl}] [INSERT {tmpl}] WHERE { patterns }``
      (one atomic snapshot; deletes then inserts, both against the
      pre-update store — SPARQL 1.1 §3.1.3)
    - ``LOAD <file-uri-or-path> [INTO GRAPH <g>]`` — the reference
      loader's core operation: parse RDF files from storage and commit
    """
    from tripleforge import update as update_mod
    from tripleforge.canon import canonicalize

    c = _Cursor(_tokenize(text))
    c.prologue()
    with_graph = None
    if _kw(c.peek(), "WITH"):
        c.next()
        k, v = c.next()
        if k != "IRI":
            raise SparqlError("WITH needs an IRIREF")
        with_graph = v[1:-1]
    t = c.peek()
    if _kw(t, "CLEAR") or _kw(t, "DROP"):
        c.next()
        if _kw(c.peek(), "SILENT"):
            c.next()
        t = c.peek()
        if _kw(t, "ALL"):
            c.next()
            which, g = "all", None
        elif _kw(t, "DEFAULT"):
            c.next()
            which, g = "default", None
        elif _kw(t, "NAMED"):
            c.next()
            which, g = "named", None
        elif t is not None and (t[0] == "GRAPHKW" or _kw(t, "GRAPH")):
            c.next()
            k, v = c.next()
            if k != "IRI":
                raise SparqlError("CLEAR/DROP GRAPH needs an IRIREF")
            which, g = "graph", v[1:-1]
        else:
            raise SparqlError("expected GRAPH <iri> | DEFAULT | NAMED | ALL")
        if c.peek() is not None:
            raise SparqlError(f"trailing tokens: {c.peek()!r}")
        return update_mod.clear(catalog, graph=g, which=which, run_id=run_id)
    if _kw(t, "CREATE"):
        c.next()
        if _kw(c.peek(), "SILENT"):
            c.next()
        if not (c.peek() and (c.peek()[0] == "GRAPHKW" or _kw(c.peek(), "GRAPH"))):
            raise SparqlError("expected GRAPH after CREATE")
        c.next()
        k, v = c.next()
        if k != "IRI":
            raise SparqlError("CREATE GRAPH needs an IRIREF")
        # graphs are implicit in this store (a graph exists iff it has
        # statements) — CREATE is a spec-compliant no-op
        return catalog.latest_snapshot_id() or 0
    if _kw(t, "COPY") or _kw(t, "MOVE") or _kw(t, "ADD"):
        op = t[1].lower()
        c.next()
        if _kw(c.peek(), "SILENT"):
            c.next()

        def graph_or_default() -> str | None:
            tk = c.peek()
            if _kw(tk, "DEFAULT"):
                c.next()
                return None
            if tk is not None and (tk[0] == "GRAPHKW" or _kw(tk, "GRAPH")):
                c.next()
                tk = c.peek()
            k, v = c.next()
            if k != "IRI":
                raise SparqlError(f"{op.upper()} needs GRAPH <iri> or DEFAULT")
            return v[1:-1]

        src = graph_or_default()
        if not _kw(c.next(), "TO"):
            raise SparqlError(f"expected TO in {op.upper()}")
        dst = graph_or_default()
        if c.peek() is not None:
            raise SparqlError(f"trailing tokens: {c.peek()!r}")
        return update_mod.graph_op(catalog, op, src, dst, run_id=run_id)
    if _kw(t, "LOAD"):
        c.next()
        if _kw(c.peek(), "SILENT"):
            c.next()
        k, v = c.next()
        if k != "IRI":
            raise SparqlError("LOAD needs a source IRIREF")
        source = v[1:-1]
        graph = with_graph
        if _kw(c.peek(), "INTO"):
            c.next()
            if not (c.peek() and (c.peek()[0] == "GRAPHKW" or _kw(c.peek(), "GRAPH"))):
                raise SparqlError("expected GRAPH after INTO")
            c.next()
            k, v = c.next()
            if k != "IRI":
                raise SparqlError("INTO GRAPH needs an IRIREF")
            graph = v[1:-1]
        if c.peek() is not None:
            raise SparqlError(f"trailing tokens after LOAD: {c.peek()!r}")
        return _exec_load(spark, catalog, source, graph, run_id)

    def as_df(rows):
        return canonicalize(
            spark.createDataFrame(
                rows,
                "subj string, pred string, obj string, obj_kind string, "
                "obj_dt string, obj_lang string, graph string",
            )
        )

    if _kw(t, "INSERT") or _kw(t, "DELETE"):
        op = "insert" if _kw(t, "INSERT") else "delete"
        c.next()
        nxt = c.peek()
        if _kw(nxt, "DATA"):
            # existing DATA path (TriG-parsed quad block)
            _, _, rows = parse_update(text)
            df = as_df(rows)
            fn = update_mod.insert_data if op == "insert" else update_mod.delete_data
            return fn(catalog, df, graph=with_graph, run_id=run_id)
        delete_tmpl = insert_tmpl = None
        if op == "delete" and _kw(nxt, "WHERE"):
            groups = _parse_group_pattern(c)
            if len(groups) > 1:
                raise SparqlError("UNION is not supported in updates")
            patterns, filters = groups[0]
            _parse_modifiers(c)
            patterns, delete_tmpl, extra = _delete_where_compile(patterns, with_graph)
            filters += extra
        else:
            if nxt != ("PUNCT", "{"):
                raise SparqlError("expected DATA, WHERE, or a template")
            tmpl = _parse_template_block(c)
            if op == "delete":
                delete_tmpl = tmpl
                if _kw(c.peek(), "INSERT"):
                    c.next()
                    insert_tmpl = _parse_template_block(c)
            else:
                insert_tmpl = tmpl
            groups = _parse_group_pattern(c)
            if len(groups) > 1:
                raise SparqlError("UNION is not supported in updates")
            patterns, filters = groups[0]
            _parse_modifiers(c)
            if with_graph is not None:
                patterns = [
                    Pattern(s=pt.s, p=pt.p, o=pt.o, g=pt.g or with_graph,
                            optional=pt.optional)
                    for pt in patterns
                ]
        sol = bgp(
            catalog.read_statements(), patterns, carry_meta=True,
            n_buckets=getattr(catalog, "n_buckets", None),
        )
        for spec in filters:
            sol = sol.where(_compile_filter(spec, set(sol.columns)))
        deletes = (
            canonicalize(_instantiate(sol, delete_tmpl, with_graph))
            if delete_tmpl
            else None
        )
        inserts = (
            canonicalize(_instantiate(sol, insert_tmpl, with_graph))
            if insert_tmpl
            else None
        )
        return update_mod.modify(catalog, deletes, inserts, run_id=run_id)
    raise SparqlError("expected LOAD, INSERT, or DELETE")


def _exec_load(
    spark: SparkSession, catalog, source: str, graph: str | None, run_id: str | None
) -> int:
    """LOAD: read RDF files from storage through the corpus scan and
    run the full build pipeline (parse → canon → graph inject → commit)
    — exactly what the reference's loader CLI does for one file set."""
    from tripleforge.io import read_files_as_corpus
    from tripleforge.pipeline import BuildConfig, build

    path = re.sub(r"^file://", "", source)
    corpus = read_files_as_corpus(spark, path)
    res = build(
        spark,
        corpus,
        catalog,
        BuildConfig(
            graph_override=graph, link_entities=False, run_id=run_id, resume=False
        ),
    )
    return res.snapshot_id
