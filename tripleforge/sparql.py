"""Minimal SPARQL text front-end (SURVEY.md §3.2 ext; VERDICT r1 #5).

The reference executes SPARQL strings read from files (its ``sparql``
CLI over RDF4J); this module closes that UX gap by parsing the
high-frequency subset onto the engine's existing programmatic surface:

- ``SELECT [DISTINCT] ?v…|*|aggregates|(expr AS ?v) WHERE { triple
  patterns [GRAPH g {…}] [OPTIONAL {…}] [MINUS {…}]
  [FILTER expr | FILTER [NOT] EXISTS {…}] [BIND(expr AS ?v)]
  [VALUES ?v {…}] [{…} UNION {…}] } [GROUP BY] [HAVING(expr)]
  [ORDER BY] [OFFSET] [LIMIT]`` → :func:`tripleforge.query.bgp`
  (each OPTIONAL block left-joins as a UNIT — exact SPARQL group
  semantics; MINUS/NOT EXISTS/EXISTS compile to anti/semi joins;
  UNION arms union with null-padded variables)
- ``CONSTRUCT { template } WHERE { … }`` → typed statement output
- ``ASK { … }`` → one boolean row
- FILTER/BIND expressions (SPARQL 1.1 §17): boolean algebra
  (``&& || !``), comparisons ``= != < > <= >=`` (numeric when either
  side is numeric), arithmetic ``+ - * /``, and the core built-ins —
  ``BOUND isIRI isURI isLiteral isBlank STR LANG LANGMATCHES DATATYPE
  STRLEN UCASE LCASE CONTAINS STRSTARTS STRENDS STRBEFORE STRAFTER
  SUBSTR REPLACE CONCAT ABS CEIL FLOOR ROUND REGEX IF COALESCE`` — all
  compiled onto Catalyst columns (no UDFs); term-metadata functions
  (LANG/DATATYPE/isIRI/…) read the carry_meta companion columns,
  requested automatically
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


def _apply_ops(
    sol: DataFrame,
    ops: list[tuple],
    statements: DataFrame | None = None,
    allow_cartesian: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Apply FILTER / BIND / VALUES / MINUS / [NOT] EXISTS operations
    in textual order (BIND is positional per SPARQL §10.1: later ops
    see its variable). MINUS and (NOT) EXISTS compile to anti/semi
    joins of the solution against the sub-BGP on shared variables —
    the shapes Catalyst executes as broadcast/shuffled anti and semi
    hash joins."""
    for op in ops:
        if op[0] == "bind":
            _, var, tree = op
            if var in sol.columns:
                raise SparqlError(f"BIND target ?{var} is already bound")
            col, _ = _compile_expr(tree, set(sol.columns))
            sol = sol.withColumn(var, col)
        elif op[0] == "subquery":
            if statements is None:
                raise SparqlError("subqueries are not available here")
            sub = _compile_select(
                statements, op[1], allow_cartesian=allow_cartesian,
                n_buckets=n_buckets,
            )
            if sol is None:
                sol = sub
                continue
            shared = [v for v in sub.columns if v in sol.columns]
            if shared:
                sol = sol.join(sub, shared, "inner")
            elif allow_cartesian:
                sol = sol.crossJoin(sub)
            else:
                raise SparqlError(
                    "subquery shares no variable with the group — the "
                    "result is a cross product; pass allow_cartesian=True"
                )
        elif op[0] == "values_multi":
            # inline table (SPARQL §10.2): tiny literal DataFrame joined
            # broadcast; UNDEF (null) cells are compatible with any
            # binding, so shared-var equality is OR'd with IS NULL
            from pyspark.sql import functions as F
            from pyspark.sql.types import StringType, StructField, StructType

            _, vnames, rows = op
            spark = sol.sparkSession
            vdf = spark.createDataFrame(
                [tuple(r) for r in rows],
                StructType(
                    [StructField(f"__values_{v}", StringType(), True)
                     for v in vnames]
                ),
            ).dropDuplicates()
            shared = [v for v in vnames if v in sol.columns]
            new = [v for v in vnames if v not in sol.columns]
            cond = F.lit(True)
            for v in shared:
                vc = vdf[f"__values_{v}"]
                cond = cond & (vc.isNull() | (sol[v] == vc))
            sol = sol.join(F.broadcast(vdf), cond, "inner")
            for v in new:
                sol = sol.withColumn(v, F.col(f"__values_{v}"))
            sol = sol.drop(*[f"__values_{v}" for v in vnames])
        elif op[0] in ("minus", "exists"):
            if statements is None:
                raise SparqlError(f"{op[0].upper()} is not available here")
            block = op[1]
            sub = bgp(
                statements, block, allow_cartesian=allow_cartesian,
                n_buckets=n_buckets,
            )
            # dataset-view evaluation appends the block's graph vars as
            # a trailing element: exclude marker-relabelled default rows
            # from their bindings (GRAPH ?var ranges over NAMED graphs)
            gexcl = (
                op[2] if op[0] == "minus" and len(op) > 2
                else op[3] if op[0] == "exists" and len(op) > 3
                else []
            )
            if gexcl:
                from pyspark.sql import functions as F

                for v in gexcl:
                    if v in sub.columns:
                        sub = sub.where(F.col(v) != _DATASET_DEFAULT_G)
            shared = [v for v in sub.columns if v in sol.columns]
            if op[0] == "minus":
                # SPARQL §8.3: solutions sharing NO variable with the
                # MINUS side are kept (disjoint-domain MINUS is a no-op)
                if shared:
                    sol = sol.join(
                        sub.select(*shared).dropDuplicates(), shared, "left_anti"
                    )
            else:
                positive = op[2]
                if not shared:
                    raise SparqlError(
                        "EXISTS block shares no variable with the group"
                    )
                how = "left_semi" if positive else "left_anti"
                sol = sol.join(sub.select(*shared).dropDuplicates(), shared, how)
        else:
            sol = sol.where(_compile_filter(op, set(sol.columns)))
    return sol


# ---------------------------------------------------------------------------
# Property paths (SPARQL 1.1 §9): predicate-position grammar
#   Path        := PathSeq ('|' PathSeq)*
#   PathSeq     := PathEltOrInv ('/' PathEltOrInv)*
#   PathEltOrInv:= '^' PathElt | PathElt
#   PathElt     := PathPrimary ('+'|'*'|'?')?
#   PathPrimary := '(' Path ')' | '!' PathNegatedPropertySet | iri | 'a'
#   PathNegatedPropertySet := PathOneInPS | '(' (PathOneInPS ('|' PathOneInPS)*)? ')'
#   PathOneInPS := iri | 'a' | '^' (iri | 'a')
# compiled by tripleforge.query.path_pairs (seq → join, alt → union,
# inv → swap, +/*/? → bounded fixpoint iteration, nps → excluded-set
# predicate scan).
# ---------------------------------------------------------------------------
def _nps_member(c: _Cursor, fwd: list, inv: list) -> None:
    sink = fwd
    if c.peek() == ("OP", "^"):
        c.next()
        sink = inv
    term = c.pattern_term("negated property set member")
    if term.startswith("?"):
        raise SparqlError("variables are not allowed inside property paths")
    sink.append(term)


def _path_primary(c: _Cursor) -> tuple:
    t = c.peek()
    if t == ("PUNCT", "("):
        c.next()
        inner = _path_alt(c)
        if c.next() != ("PUNCT", ")"):
            raise SparqlError("unterminated ( path )")
        return inner
    if t == ("OP", "!"):
        c.next()
        fwd: list[str] = []
        inv: list[str] = []
        if c.peek() == ("PUNCT", "("):
            c.next()
            if c.peek() != ("PUNCT", ")"):
                _nps_member(c, fwd, inv)
                while c.peek() == ("OP", "|"):
                    c.next()
                    _nps_member(c, fwd, inv)
            if c.next() != ("PUNCT", ")"):
                raise SparqlError("unterminated !( property set )")
        else:
            _nps_member(c, fwd, inv)
        return ("nps", fwd, inv)
    if t is not None and t[0] == "VAR":
        c.next()
        return ("varleaf", "?" + t[1][1:])
    return ("leaf", c.pattern_term("predicate"))


def _path_elt(c: _Cursor) -> tuple:
    prim = _path_primary(c)
    t = c.peek()
    if t == ("OP", "+"):
        c.next()
        return ("plus", prim)
    if t is not None and t[0] == "STAR":
        c.next()
        return ("star", prim)
    if t is not None and t[0] == "QMARK":
        c.next()
        return ("opt", prim)
    return prim


def _path_elt_or_inverse(c: _Cursor) -> tuple:
    if c.peek() == ("OP", "^"):
        c.next()
        return ("inv", _path_elt(c))
    return _path_elt(c)


def _path_seq(c: _Cursor) -> tuple:
    parts = [_path_elt_or_inverse(c)]
    while c.peek() == ("OP", "/"):
        c.next()
        parts.append(_path_elt_or_inverse(c))
    return parts[0] if len(parts) == 1 else ("seq", parts)


def _path_alt(c: _Cursor) -> tuple:
    arms = [_path_seq(c)]
    while c.peek() == ("OP", "|"):
        c.next()
        arms.append(_path_seq(c))
    return arms[0] if len(arms) == 1 else ("alt", arms)


def _no_nested_var(ast: tuple) -> None:
    if ast[0] == "varleaf":
        raise SparqlError("variables are not allowed inside property paths")
    for a in ast[1:]:
        if isinstance(a, tuple):
            _no_nested_var(a)
        elif isinstance(a, list):
            for x in a:
                _no_nested_var(x)


def _parse_path_expr(c: _Cursor) -> str | tuple:
    """Predicate position: plain term string (IRI or ?var) for trivial
    paths, else a path AST handed to query.path_scan."""
    ast = _path_alt(c)
    if ast[0] in ("leaf", "varleaf"):
        return ast[1]
    _no_nested_var(ast)
    return ast


def _optional_ops_transform(bops: list[tuple]):
    """FILTER/BIND ops scoped inside an OPTIONAL block → a DataFrame
    transform applied to the block's sub-BGP BEFORE the left-outer
    join.

    DELIBERATE RESTRICTION vs the spec (ADVICE r3): SPARQL §18.2.2.3
    makes an OPTIONAL-scoped FILTER part of the LeftJoin CONDITION, so
    it may reference variables bound only on the left-hand side; this
    engine compiles it against the block's own bindings and raises
    'expression variable not bound' for such queries (loud, tested as
    a limitation in test_sparql_text.py) rather than silently joining
    wrong. Filters that reference only block-local variables — the
    overwhelmingly common case — are exact: they can only drop/extend
    optional rows, never required ones."""

    def transform(sub: DataFrame) -> DataFrame:
        out = sub
        for op in bops:
            if op[0] == "expr":
                out = out.where(_compile_filter(op, set(out.columns)))
            elif op[0] == "bind":
                _, alias, tree = op
                if alias in out.columns:
                    raise SparqlError(f"BIND alias ?{alias} is already bound")
                col, _ = _compile_expr(tree, set(out.columns))
                out = out.withColumn(alias, col)
            else:  # pragma: no cover - parser only emits expr/bind here
                raise SparqlError(f"unsupported op inside OPTIONAL: {op[0]}")
        return out

    return transform


def _solutions(
    statements: DataFrame,
    groups: list[tuple],
    allow_cartesian: bool = False,
    carry_meta: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Union of per-group BGP solutions (SPARQL UNION: variables
    unbound in one arm come back null via allowMissingColumns).
    Object-term metadata columns are carried automatically whenever a
    group's expressions need them (LANG/DATATYPE/isIRI/…)."""
    sols = []
    for patterns, ops, optional_blocks in groups:
        meta = carry_meta or _ops_need_meta(ops) or any(
            _ops_need_meta(e[1])
            for e in optional_blocks
            if isinstance(e, tuple)
        )
        if not patterns and ops and ops[0][0] == "subquery":
            # group consists of a subquery (± trailing ops): the
            # subquery's projection seeds the solution (sol=None)
            sol = None
        else:
            sol = bgp(
                statements, patterns, allow_cartesian=allow_cartesian,
                carry_meta=meta, n_buckets=n_buckets,
                optional_groups=[
                    (e[0], _optional_ops_transform(e[1]))
                    if isinstance(e, tuple)
                    else e
                    for e in optional_blocks
                ],
            )
        sols.append(
            _apply_ops(
                sol, ops, statements=statements,
                allow_cartesian=allow_cartesian, n_buckets=n_buckets,
            )
        )
    out = sols[0]
    for sol in sols[1:]:
        out = out.unionByName(sol, allowMissingColumns=True)
    return out


_AGG_FNS = ("COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT")


def _parse_agg_projection(c: _Cursor) -> tuple:
    """'(' AGG '(' [DISTINCT] ?v|* [; SEPARATOR="s"] ')' AS ?alias ')' →
    ("agg", fn, arg ('*' or var name), distinct, alias, separator)."""
    c.next()  # '('
    t = c.next()
    fn = t[1].upper()
    if t[0] != "WORD" or fn not in _AGG_FNS:
        raise SparqlError(f"unsupported aggregate {t[1]!r}")
    if c.next() != ("PUNCT", "("):
        raise SparqlError(f"expected '(' after {fn}")
    distinct = False
    if _kw(c.peek(), "DISTINCT") or _kw(c.peek(), "REDUCED"):
        # REDUCED *permits* duplicate elimination (SPARQL §15.3.2);
        # eliminating is the conforming, deterministic choice here
        c.next()
        distinct = True
    t = c.peek()
    if t is not None and t[0] == "STAR":
        c.next()
        if fn != "COUNT":
            raise SparqlError(f"{fn}(*) is not valid SPARQL")
        arg = "*"
    else:
        # full expression argument (§18.4): SUM(?a * ?b), AVG(YEAR(?t)),
        # … — a plain variable stays a string for back-compat
        tree = _parse_expression(c)
        arg = tree[1] if tree[0] == "var" else tree
    sep = " "
    if c.peek() == ("PUNCT", ";"):
        if fn != "GROUP_CONCAT":
            raise SparqlError("only GROUP_CONCAT takes a SEPARATOR")
        c.next()
        if not _kw(c.next(), "SEPARATOR"):
            raise SparqlError("expected SEPARATOR after ';'")
        if c.next() != ("OP", "="):
            raise SparqlError("expected = after SEPARATOR")
        k, v = c.next()
        if k not in ("DQ", "SQ"):
            raise SparqlError("SEPARATOR must be a string literal")
        sep = v[1:-1]
    if c.next() != ("PUNCT", ")"):
        raise SparqlError(f"unterminated {fn}(...)")
    if not _kw(c.next(), "AS"):
        raise SparqlError("aggregate projection needs AS ?alias")
    t = c.next()
    if t[0] != "VAR":
        raise SparqlError("AS needs a variable alias")
    if c.next() != ("PUNCT", ")"):
        raise SparqlError("unterminated aggregate projection")
    return ("agg", fn, arg, distinct, t[1][1:], sep)


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
    return _parse_select_cursor(c)


def _parse_select_cursor(c: _Cursor) -> tuple[list[tuple], list[tuple], dict, bool]:
    """Cursor-based SELECT parser — shared by top-level queries and
    ``{ SELECT … }`` subqueries (SPARQL 1.1 §12)."""
    if not _kw(c.peek(), "SELECT"):
        raise SparqlError("only SELECT queries are supported here")
    c.next()
    distinct = False
    if _kw(c.peek(), "DISTINCT") or _kw(c.peek(), "REDUCED"):
        # REDUCED *permits* duplicate elimination (SPARQL §15.3.2);
        # eliminating is the conforming, deterministic choice here
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
            # lookahead: aggregate '(COUNT(' vs expression '(expr AS ?v)'
            t1 = c.toks[c.i + 1] if c.i + 1 < len(c.toks) else None
            t2 = c.toks[c.i + 2] if c.i + 2 < len(c.toks) else None
            if (
                t1 is not None
                and t1[0] == "WORD"
                and t1[1].upper() in _AGG_FNS
                and t2 == ("PUNCT", "(")
            ):
                projected.append(_parse_agg_projection(c))
                continue
            c.next()  # '('
            tree = _parse_expression(c)
            if not _kw(c.next(), "AS"):
                raise SparqlError("expression projection needs AS ?alias")
            k, v = c.next()
            if k != "VAR":
                raise SparqlError("AS needs a variable alias")
            if c.next() != ("PUNCT", ")"):
                raise SparqlError("unterminated expression projection")
            projected.append(("exprproj", v[1:], tree))
            continue
        break
    dataset = _parse_dataset(c)
    groups = _parse_group_pattern(c)
    mods = _parse_modifiers(c)
    mods["dataset"] = dataset
    return projected, groups, mods, distinct


# ---------------------------------------------------------------------------
# Expression layer (SPARQL 1.1 §17): precedence-climbing parser → tuple
# AST → Catalyst Column. Covers boolean algebra (&& || !), comparisons,
# arithmetic, and the core built-in functions over this engine's
# string-lexical columns; object-term metadata (kind/datatype/lang)
# compiles onto the carry_meta companion columns.
#
# AST nodes: ("var", name) ("num", float) ("str", lex) ("iri", iri)
# ("boollit", bool) ("or"/"and", l, r) ("not", e) ("neg", e)
# ("cmp", op, l, r) ("arith", op, l, r) ("fn", NAME, [args])
# ---------------------------------------------------------------------------
_CMP_OPS = ("=", "!=", "<", ">", "<=", ">=")

# functions whose compilation reads the carry_meta companion columns
_META_FNS = {
    "LANG", "DATATYPE", "ISIRI", "ISURI", "ISLITERAL", "LANGMATCHES",
    "SAMETERM", "ISNUMERIC",
}

_XSD = "http://www.w3.org/2001/XMLSchema#"
_NUMERIC_DTS = {
    _XSD + t
    for t in (
        "integer", "decimal", "double", "float", "long", "int", "short",
        "byte", "nonNegativeInteger", "nonPositiveInteger",
        "negativeInteger", "positiveInteger", "unsignedLong",
        "unsignedInt", "unsignedShort", "unsignedByte",
    )
}
_FN_NAMES = _META_FNS | {
    "BOUND", "ISBLANK", "STR", "STRLEN", "UCASE", "LCASE", "CONTAINS",
    "STRSTARTS", "STRENDS", "SUBSTR", "REPLACE", "CONCAT", "ABS", "CEIL",
    "FLOOR", "ROUND", "REGEX", "IF", "COALESCE", "STRBEFORE", "STRAFTER",
    "MD5", "SHA1", "SHA256", "SHA384", "SHA512", "ENCODE_FOR_URI",
    # date/time accessors (SPARQL 1.1 §17.4.5) over canonical
    # xsd:dateTime lexicals
    "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "TZ", "TIMEZONE",
    # term constructors / misc
    "IRI", "URI", "STRLANG", "STRDT", "BNODE",
    # non-deterministic (shape-tested only; no DuckDB oracle possible)
    "NOW", "UUID", "STRUUID", "RAND",
}

# XSD constructor casts (SPARQL 1.1 §17.5 XPath constructor functions):
# xsd:integer(?x) etc. in expression position
_CAST_NUM_INT = {
    _XSD + t for t in ("integer", "long", "int", "short", "byte")
}
_CAST_NUM_REAL = {_XSD + t for t in ("decimal", "double", "float")}
_CAST_TYPES = (
    _CAST_NUM_INT
    | _CAST_NUM_REAL
    | {_XSD + "string", _XSD + "boolean", _XSD + "dateTime"}
)


def _parse_expression(c: _Cursor) -> tuple:
    return _parse_or(c)


def _parse_or(c: _Cursor) -> tuple:
    left = _parse_and(c)
    while c.peek() == ("OP", "||"):
        c.next()
        left = ("or", left, _parse_and(c))
    return left


def _parse_and(c: _Cursor) -> tuple:
    left = _parse_rel(c)
    while c.peek() == ("OP", "&&"):
        c.next()
        left = ("and", left, _parse_rel(c))
    return left


def _parse_rel(c: _Cursor) -> tuple:
    left = _parse_add(c)
    t = c.peek()
    if t is not None and t[0] == "OP" and t[1] in _CMP_OPS:
        op = c.next()[1]
        return ("cmp", op, left, _parse_add(c))
    if _kw(t, "IN") or _kw(t, "NOT"):
        neg = _kw(t, "NOT")
        c.next()
        if neg and not _kw(c.next(), "IN"):
            raise SparqlError("expected IN after NOT in expression")
        if c.next() != ("PUNCT", "("):
            raise SparqlError("expected '(' after IN")
        items: list[tuple] = []
        if c.peek() != ("PUNCT", ")"):
            while True:
                items.append(_parse_expression(c))
                if c.peek() == ("PUNCT", ","):
                    c.next()
                    continue
                break
        if c.next() != ("PUNCT", ")"):
            raise SparqlError("unterminated IN (...)")
        return ("inlist", neg, left, items)
    return left


def _parse_add(c: _Cursor) -> tuple:
    left = _parse_mul(c)
    while True:
        t = c.peek()
        if t is not None and t[0] == "OP" and t[1] in ("+", "-"):
            op = c.next()[1]
            left = ("arith", op, left, _parse_mul(c))
        elif (
            t is not None
            and t[0] in ("INTEGER", "DECIMAL", "DOUBLE")
            and t[1][0] in "+-"
        ):
            # signed literal glued to the left operand (?x -5): the
            # lexer kept the sign with the number, re-interpret as
            # addition of the signed value
            c.next()
            left = ("arith", "+", left, ("num", float(t[1])))
        else:
            return left


def _parse_mul(c: _Cursor) -> tuple:
    left = _parse_unary(c)
    while True:
        t = c.peek()
        if t is not None and t[0] == "STAR":
            c.next()
            left = ("arith", "*", left, _parse_unary(c))
        elif t == ("OP", "/"):
            c.next()
            left = ("arith", "/", left, _parse_unary(c))
        else:
            return left


def _parse_unary(c: _Cursor) -> tuple:
    t = c.peek()
    if t == ("OP", "!"):
        c.next()
        return ("not", _parse_unary(c))
    if t == ("OP", "-"):
        c.next()
        return ("neg", _parse_unary(c))
    if t == ("OP", "+"):
        c.next()
        return _parse_unary(c)
    return _parse_primary(c)


def _parse_primary(c: _Cursor) -> tuple:
    from tripleforge.canon import normalize_iri_str

    t = c.peek()
    if t is None:
        raise SparqlError("unexpected end of expression")
    if t == ("PUNCT", "("):
        c.next()
        e = _parse_expression(c)
        if c.next() != ("PUNCT", ")"):
            raise SparqlError("unterminated ( expression )")
        return e
    kind, val = t
    if kind == "VAR":
        c.next()
        return ("var", val[1:])
    if kind in ("INTEGER", "DECIMAL", "DOUBLE"):
        c.next()
        return ("num", float(val))
    if kind in ("DQ", "SQ", "LONG_DQ", "LONG_SQ"):
        c.next()
        lex = val[3:-3] if kind.startswith("LONG") else val[1:-1]
        nxt = c.peek()
        if nxt is not None and nxt[0] in ("LANG", "DTSEP"):
            # comparison is on the lexical form; consume the suffix
            if nxt[0] == "DTSEP":
                c.next()
                c.next()
            else:
                c.next()
        return ("str", lex)
    if kind == "IRI":
        c.next()
        # IRI constants canonicalize exactly like triple-pattern
        # constants (ADVICE r2: FILTER(?v = <HTTP://EX.ORG/>) must
        # match the store's canonical spelling)
        iri = normalize_iri_str(val[1:-1])
        if iri in _CAST_TYPES and c.peek() == ("PUNCT", "("):
            return _parse_cast(c, iri)
        return ("iri", iri)
    if kind == "PNAME" and ":" in val:
        c.next()
        ns, _, local = val.partition(":")
        if ns not in c.prefixes:
            raise SparqlError(f"undefined prefix {ns!r}:")
        iri = normalize_iri_str(c.prefixes[ns] + local)
        if iri in _CAST_TYPES and c.peek() == ("PUNCT", "("):
            return _parse_cast(c, iri)
        return ("iri", iri)
    if kind == "KW" and val in ("true", "false"):
        c.next()
        return ("boollit", val == "true")
    if kind in ("WORD", "GRAPHKW", "KW", "SPARQL_KW"):
        name = val.upper()
        if name in _AGG_FNS:
            # aggregate call inside an expression — valid in HAVING
            # (compiled to a synthesized aggregate column); rejected at
            # compile time anywhere else
            c.next()
            if c.next() != ("PUNCT", "("):
                raise SparqlError(f"expected '(' after {name}")
            distinct = False
            if _kw(c.peek(), "DISTINCT"):
                c.next()
                distinct = True
            t2 = c.peek()
            if t2 is not None and t2[0] == "STAR":
                c.next()
                arg = "*"
            else:
                tree = _parse_expression(c)
                arg = tree[1] if tree[0] == "var" else tree
            if c.next() != ("PUNCT", ")"):
                raise SparqlError(f"unterminated {name}(...)")
            return ("aggfn", name, arg, distinct)
        if name not in _FN_NAMES:
            raise SparqlError(f"unsupported function {val!r}")
        c.next()
        if c.next() != ("PUNCT", "("):
            raise SparqlError(f"expected '(' after {name}")
        args: list[tuple] = []
        if c.peek() != ("PUNCT", ")"):
            while True:
                args.append(_parse_expression(c))
                if c.peek() == ("PUNCT", ","):
                    c.next()
                    continue
                break
        if c.next() != ("PUNCT", ")"):
            raise SparqlError(f"unterminated {name}(...)")
        return ("fn", name, args)
    raise SparqlError(f"bad expression term {val!r}")


def _parse_cast(c: _Cursor, xsd_iri: str) -> tuple:
    """XPath constructor cast ``xsd:integer(expr)`` — the '(' is the
    lookahead that distinguishes a cast from a plain IRI constant."""
    if c.next() != ("PUNCT", "("):
        raise SparqlError(f"expected '(' after <{xsd_iri}>")
    arg = _parse_expression(c)
    if c.next() != ("PUNCT", ")"):
        raise SparqlError(f"unterminated <{xsd_iri}>(...)")
    return ("cast", xsd_iri, arg)


def _parse_constraint(c: _Cursor) -> tuple:
    """FILTER Constraint := BrackettedExpression | BuiltInCall."""
    if c.peek() == ("PUNCT", "("):
        c.next()
        e = _parse_expression(c)
        if c.next() != ("PUNCT", ")"):
            raise SparqlError("unterminated FILTER (...)")
        return e
    return _parse_primary(c)


def _expr_needs_meta(tree: tuple) -> bool:
    if tree[0] == "fn":
        return tree[1] in _META_FNS or any(_expr_needs_meta(a) for a in tree[2])
    if tree[0] == "cmp" and tree[2][0] == "var" and tree[3][0] == "var":
        # var-vs-var ordering is datatype-aware at runtime (needs __dt)
        return True
    return any(
        _expr_needs_meta(a) for a in tree[1:] if isinstance(a, tuple)
    )


def _ops_need_meta(ops: list[tuple]) -> bool:
    for op in ops:
        if op[0] == "expr" and _expr_needs_meta(op[1]):
            return True
        if op[0] == "bind" and _expr_needs_meta(op[2]):
            return True
    return False


def _var_col(var: str, bound: set[str]):
    from pyspark.sql import functions as F

    if var not in bound:
        raise SparqlError(f"expression variable ?{var} is not bound")
    return F.col(var)


def _as_str(col, typ):
    return col.cast("string") if typ in ("num", "bool") else col


def _as_num(col, typ):
    return col if typ == "num" else col.cast("double")


def _as_bool(col, typ):
    if typ == "bool":
        return col
    raise SparqlError(
        "logical operators need boolean operands (comparison, regex(), "
        "bound(), …) — bare terms have no effective-boolean-value here"
    )


def _compile_expr(tree: tuple, bound: set[str]):
    """AST → (Catalyst Column, type tag ∈ num|str|bool|term)."""
    from pyspark.sql import functions as F

    kind = tree[0]
    if kind == "var":
        return _var_col(tree[1], bound), "term"
    if kind == "num":
        v = tree[1]
        return F.lit(v), "num"
    if kind in ("str", "iri"):
        return F.lit(tree[1]), "str"
    if kind == "boollit":
        return F.lit(tree[1]), "bool"
    if kind == "or":
        lc, lt = _compile_expr(tree[1], bound)
        rc, rt = _compile_expr(tree[2], bound)
        return _as_bool(lc, lt) | _as_bool(rc, rt), "bool"
    if kind == "and":
        lc, lt = _compile_expr(tree[1], bound)
        rc, rt = _compile_expr(tree[2], bound)
        return _as_bool(lc, lt) & _as_bool(rc, rt), "bool"
    if kind == "not":
        ec, et = _compile_expr(tree[1], bound)
        return ~_as_bool(ec, et), "bool"
    if kind == "neg":
        ec, et = _compile_expr(tree[1], bound)
        return -_as_num(ec, et), "num"
    if kind == "arith":
        _, op, l, r = tree
        lc, lt = _compile_expr(l, bound)
        rc, rt = _compile_expr(r, bound)
        lc, rc = _as_num(lc, lt), _as_num(rc, rt)
        fns = {
            "+": lc.__add__, "-": lc.__sub__,
            "*": lc.__mul__, "/": lc.__truediv__,
        }
        return fns[op](rc), "num"
    if kind == "inlist":
        # ?v IN (a, b, …) ≡ (?v = a) || (?v = b) …; NOT IN ≡ the
        # conjunction of != — each equality reuses cmp's type coercion,
        # and Catalyst folds the OR-of-equalities into an In predicate
        _, neg, left, items = tree
        if not items:
            return F.lit(bool(neg)), "bool"
        sub = "!=" if neg else "="
        cols = [
            _as_bool(*_compile_expr(("cmp", sub, left, it), bound))
            for it in items
        ]
        out = cols[0]
        for col in cols[1:]:
            out = (out & col) if neg else (out | col)
        return out, "bool"
    if kind == "cmp":
        _, op, l, r = tree
        lc, lt = _compile_expr(l, bound)
        rc, rt = _compile_expr(r, bound)
        if "num" in (lt, rt):
            lc, rc = _as_num(lc, lt), _as_num(rc, rt)
        elif "bool" in (lt, rt):
            # a boolean literal compares against the store's canonical
            # xsd:boolean lexical form
            lc = lc.cast("string") if lt == "bool" else lc
            rc = rc.cast("string") if rt == "bool" else rc
        elif l[0] == "var" and r[0] == "var":
            # var-vs-var: datatype-aware at runtime — two numeric-typed
            # literals compare by VALUE ("9" < "10"), everything else by
            # canonical lexical (IRIs; xsd:dateTime's canonical Z form
            # is lexicographically value-ordered already)
            ldt, rdt = f"{l[1]}__dt", f"{r[1]}__dt"
            if ldt in bound and rdt in bound and op not in ("=", "!="):
                num = F.lit(sorted(_NUMERIC_DTS))
                both_num = F.array_contains(num, F.col(ldt)) & F.array_contains(
                    num, F.col(rdt)
                )
                nfns = {
                    "<": lc.cast("double").__lt__, ">": lc.cast("double").__gt__,
                    "<=": lc.cast("double").__le__, ">=": lc.cast("double").__ge__,
                }
                sfns = {
                    "<": lc.__lt__, ">": lc.__gt__,
                    "<=": lc.__le__, ">=": lc.__ge__,
                }
                return (
                    F.when(both_num, nfns[op](rc.cast("double"))).otherwise(
                        sfns[op](rc)
                    ),
                    "bool",
                )
        fns = {
            "=": lc.__eq__, "!=": lc.__ne__, "<": lc.__lt__,
            ">": lc.__gt__, "<=": lc.__le__, ">=": lc.__ge__,
        }
        return fns[op](rc), "bool"
    if kind == "cast":
        _, dt, arg = tree
        ec, et = _compile_expr(arg, bound)
        if dt in _CAST_NUM_INT:
            # XPath casting to integer truncates toward zero
            return _as_num(ec, et).cast("long").cast("double"), "num"
        if dt in _CAST_NUM_REAL:
            return _as_num(ec, et), "num"
        if dt == _XSD + "boolean":
            if et == "bool":
                return ec, "bool"
            if et == "num":
                return ec != F.lit(0.0), "bool"
            s = _as_str(ec, et)
            return (
                F.when(s.isin("true", "1"), F.lit(True))
                .when(s.isin("false", "0"), F.lit(False))
                .otherwise(F.lit(None).cast("boolean")),
                "bool",
            )
        # xsd:string / xsd:dateTime: lexical pass-through (dateTime
        # lexicals are stored canonically, so equality/order hold)
        return _as_str(ec, et), "str"
    if kind == "fn":
        return _compile_fn(tree[1], tree[2], bound)
    if kind == "aggfn":
        raise SparqlError(
            "aggregate calls are only allowed in SELECT projections "
            "and HAVING"
        )
    raise SparqlError(f"cannot compile expression node {kind!r}")


# per-query NOW() value (SPARQL §17.4.5.1: one timestamp per query);
# reset by every top-level entrypoint, captured lazily on first NOW()
_QUERY_NOW: list = [None]


def _reset_query_clock() -> None:
    _QUERY_NOW[0] = None


def _fn_arity(name: str, args: list, lo: int, hi: int | None = None) -> None:
    hi = lo if hi is None else hi
    if not (lo <= len(args) <= hi):
        raise SparqlError(f"{name}() takes {lo}..{hi} arguments, got {len(args)}")


def _meta_col(args: list[tuple], fn: str, suffix: str, bound: set[str]):
    """The carry_meta companion column of a variable argument, or None
    when the variable was bound in a non-object position (where every
    term is an IRI by construction — subjects/predicates/graphs)."""
    from pyspark.sql import functions as F

    if not args or args[0][0] != "var":
        raise SparqlError(f"{fn}() needs a variable argument")
    v = args[0][1]
    _var_col(v, bound)  # bound-ness check
    name = f"{v}__{suffix}"
    return F.col(name) if name in bound else None


def _compile_fn(name: str, args: list[tuple], bound: set[str]):
    from pyspark.sql import functions as F

    if name == "BOUND":
        _fn_arity(name, args, 1)
        if args[0][0] != "var":
            raise SparqlError("BOUND() needs a variable")
        return _var_col(args[0][1], bound).isNotNull(), "bool"
    if name == "STR":
        _fn_arity(name, args, 1)
        c, t = _compile_expr(args[0], bound)
        return _as_str(c, t), "str"
    if name == "LANG":
        _fn_arity(name, args, 1)
        mc = _meta_col(args, name, "lang", bound)
        # SPARQL: LANG of a plain/typed literal (or IRI) is ""
        return (F.coalesce(mc, F.lit("")) if mc is not None else F.lit("")), "str"
    if name == "LANGMATCHES":
        _fn_arity(name, args, 2)
        lc, lt = _compile_expr(args[0], bound)
        if args[1][0] != "str":
            raise SparqlError("LANGMATCHES() range must be a string literal")
        rng = args[1][1].lower()
        lang = F.lower(_as_str(lc, lt))
        if rng == "*":
            return lang != F.lit(""), "bool"
        return (lang == F.lit(rng)) | lang.startswith(rng + "-"), "bool"
    if name == "DATATYPE":
        _fn_arity(name, args, 1)
        mc = _meta_col(args, name, "dt", bound)
        if mc is None:
            return F.lit(None).cast("string"), "str"
        return mc, "str"
    if name in ("ISIRI", "ISURI"):
        _fn_arity(name, args, 1)
        mc = _meta_col(args, name, "kind", bound)
        val = _var_col(args[0][1], bound)
        skolem = val.startswith("urn:skolem:")
        if mc is None:  # non-object position: IRI unless a skolem bnode
            return ~skolem, "bool"
        return (mc == F.lit("iri")) & ~skolem, "bool"
    if name == "ISLITERAL":
        _fn_arity(name, args, 1)
        mc = _meta_col(args, name, "kind", bound)
        if mc is None:
            return F.lit(False), "bool"
        return mc == F.lit("literal"), "bool"
    if name == "ISBLANK":
        _fn_arity(name, args, 1)
        if args[0][0] != "var":
            raise SparqlError("isBlank() needs a variable")
        # blank nodes are deterministically skolemized at parse time
        # (A10) — a skolem IRI is this engine's blank-node identity
        return _var_col(args[0][1], bound).startswith("urn:skolem:"), "bool"
    if name == "STRLEN":
        _fn_arity(name, args, 1)
        c, t = _compile_expr(args[0], bound)
        return F.length(_as_str(c, t)), "num"
    if name in ("UCASE", "LCASE"):
        _fn_arity(name, args, 1)
        c, t = _compile_expr(args[0], bound)
        fn = F.upper if name == "UCASE" else F.lower
        return fn(_as_str(c, t)), "str"
    if name in ("CONTAINS", "STRSTARTS", "STRENDS", "STRBEFORE", "STRAFTER"):
        _fn_arity(name, args, 2)
        lc, lt = _compile_expr(args[0], bound)
        rc, rt = _compile_expr(args[1], bound)
        ls, rs = _as_str(lc, lt), _as_str(rc, rt)
        if name == "CONTAINS":
            return ls.contains(rs), "bool"
        if name == "STRSTARTS":
            return ls.startswith(rs), "bool"
        if name == "STRENDS":
            return ls.endswith(rs), "bool"
        # SPARQL: STRBEFORE/STRAFTER of an absent separator is "";
        # substring_index needs a plain-string delimiter
        if args[1][0] != "str":
            raise SparqlError(f"{name}() separator must be a string literal")
        sep = args[1][1]
        found = ls.contains(F.lit(sep))
        if name == "STRBEFORE":
            return F.when(found, F.substring_index(ls, sep, 1)).otherwise(F.lit("")), "str"
        after = F.substr(
            ls, F.length(F.substring_index(ls, sep, 1)) + F.lit(len(sep) + 1)
        )
        return F.when(found, after).otherwise(F.lit("")), "str"
    if name == "SUBSTR":
        _fn_arity(name, args, 2, 3)
        c, t = _compile_expr(args[0], bound)
        start_c, start_t = _compile_expr(args[1], bound)
        start = _as_num(start_c, start_t).cast("int")
        if len(args) == 3:
            ln_c, ln_t = _compile_expr(args[2], bound)
            return F.substr(_as_str(c, t), start, _as_num(ln_c, ln_t).cast("int")), "str"
        return F.substr(_as_str(c, t), start), "str"
    if name == "REPLACE":
        _fn_arity(name, args, 3, 4)
        c, t = _compile_expr(args[0], bound)
        if args[1][0] != "str" or args[2][0] != "str":
            raise SparqlError("REPLACE() pattern/replacement must be string literals")
        pat = args[1][1]
        if len(args) == 4 and args[3][0] == "str" and "i" in args[3][1]:
            pat = "(?i)" + pat
        return F.regexp_replace(_as_str(c, t), pat, args[2][1]), "str"
    if name == "CONCAT":
        if not args:
            raise SparqlError("CONCAT() needs arguments")
        cols = [_as_str(*_compile_expr(a, bound)) for a in args]
        return F.concat(*cols), "str"
    if name in ("ABS", "CEIL", "FLOOR", "ROUND"):
        _fn_arity(name, args, 1)
        c, t = _compile_expr(args[0], bound)
        fn = {"ABS": F.abs, "CEIL": F.ceil, "FLOOR": F.floor, "ROUND": F.round}[name]
        return fn(_as_num(c, t)), "num"
    if name == "REGEX":
        _fn_arity(name, args, 2, 3)
        c, t = _compile_expr(args[0], bound)
        if args[1][0] != "str":
            raise SparqlError("regex() pattern must be a string literal")
        pat = args[1][1]
        if len(args) == 3:
            if args[2][0] != "str":
                raise SparqlError("regex() flags must be a string literal")
            if "i" in args[2][1]:
                pat = "(?i)" + pat
        return _as_str(c, t).rlike(pat), "bool"
    if name == "IF":
        _fn_arity(name, args, 3)
        cc, ct = _compile_expr(args[0], bound)
        ac, at_ = _compile_expr(args[1], bound)
        bc, bt = _compile_expr(args[2], bound)
        typ = at_ if at_ == bt else "term"
        return F.when(_as_bool(cc, ct), ac).otherwise(bc), typ
    if name in ("MD5", "SHA1", "SHA256", "SHA384", "SHA512"):
        _fn_arity(name, args, 1)
        c, t = _compile_expr(args[0], bound)
        s = _as_str(c, t)
        if name == "MD5":
            return F.md5(s.cast("binary")), "str"
        if name == "SHA1":
            return F.sha1(s.cast("binary")), "str"
        return F.sha2(s.cast("binary"), int(name[3:])), "str"
    if name == "ENCODE_FOR_URI":
        _fn_arity(name, args, 1)
        c, t = _compile_expr(args[0], bound)
        # SPARQL ENCODE_FOR_URI = fn:encode-for-uri: escape everything
        # except [A-Za-z0-9] - _ . ~ ; url_encode (form-encoding)
        # differs only on space ('+' vs '%20'), '*' (left raw) and '~'
        # (escaped)
        enc = F.url_encode(_as_str(c, t))
        enc = F.replace(enc, F.lit("+"), F.lit("%20"))
        enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
        enc = F.replace(enc, F.lit("%7E"), F.lit("~"))
        return enc, "str"
    if name == "COALESCE":
        if not args:
            raise SparqlError("COALESCE() needs arguments")
        compiled = [_compile_expr(a, bound) for a in args]
        typs = {t for _, t in compiled}
        typ = typs.pop() if len(typs) == 1 else "term"
        return F.coalesce(*[c for c, _ in compiled]), typ
    if name in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS"):
        # accessors over the store's canonical xsd:dateTime lexical
        # (canon._canon_datetime: UTC Z, trimmed fraction; tz-less
        # stays as written) — regexp_extract of a non-match is "",
        # which casts to null = SPARQL type error
        _fn_arity(name, args, 1)
        c, t = _compile_expr(args[0], bound)
        s = _as_str(c, t)
        pats = {
            "YEAR": r"^(-?\d{4,})-",
            "MONTH": r"^-?\d{4,}-(\d{2})-",
            "DAY": r"^-?\d{4,}-\d{2}-(\d{2})",
            "HOURS": r"T(\d{2}):",
            "MINUTES": r"T\d{2}:(\d{2}):",
            "SECONDS": r"T\d{2}:\d{2}:(\d{2}(?:\.\d+)?)",
        }
        col = F.regexp_extract(s, pats[name], 1)
        return col.cast("double" if name == "SECONDS" else "int"), "num"
    if name in ("TZ", "TIMEZONE"):
        _fn_arity(name, args, 1)
        c, t = _compile_expr(args[0], bound)
        tz = F.regexp_extract(_as_str(c, t), r"(Z|[+-]\d{2}:\d{2})$", 1)
        if name == "TZ":
            return tz, "str"
        # TIMEZONE → xsd:dayTimeDuration lexical; absent tz → null
        # (SPARQL type error)
        hh = F.regexp_extract(tz, r"[+-](\d{2}):\d{2}", 1).cast("int")
        mm = F.regexp_extract(tz, r"[+-]\d{2}:(\d{2})", 1).cast("int")
        sign = F.when(tz.startswith("-"), F.lit("-")).otherwise(F.lit(""))
        dur = F.when((hh == 0) & (mm == 0), F.lit("PT0S")).otherwise(
            F.concat(
                sign,
                F.lit("PT"),
                F.when(hh > 0, F.concat(hh.cast("string"), F.lit("H"))).otherwise(F.lit("")),
                F.when(mm > 0, F.concat(mm.cast("string"), F.lit("M"))).otherwise(F.lit("")),
            )
        )
        return (
            F.when(tz == "Z", F.lit("PT0S"))
            .when(tz == "", F.lit(None).cast("string"))
            .otherwise(dur),
            "str",
        )
    if name in ("IRI", "URI"):
        # constants were canonicalized at parse time; a computed value
        # passes through lexically (no base resolution at runtime)
        _fn_arity(name, args, 1)
        c, t = _compile_expr(args[0], bound)
        return _as_str(c, t), "str"
    if name in ("STRLANG", "STRDT"):
        # constructed-literal value; this engine's solution columns are
        # lexical, so the constructed tag/datatype participates in
        # output serialization only, not in downstream LANG()/DATATYPE()
        _fn_arity(name, args, 2)
        c, t = _compile_expr(args[0], bound)
        return _as_str(c, t), "str"
    if name == "SAMETERM":
        _fn_arity(name, args, 2)
        lc, lt = _compile_expr(args[0], bound)
        rc, rt = _compile_expr(args[1], bound)
        cond = _as_str(lc, lt).eqNullSafe(_as_str(rc, rt))
        if args[0][0] == "var" and args[1][0] == "var":
            # identical term = identical value AND identical
            # kind/datatype/lang; a variable bound in a non-object
            # position is an IRI by construction
            for suffix, dflt in (("kind", "iri"), ("dt", None), ("lang", None)):
                ln = f"{args[0][1]}__{suffix}"
                rn = f"{args[1][1]}__{suffix}"
                lcol = F.col(ln) if ln in bound else F.lit(dflt).cast("string")
                rcol = F.col(rn) if rn in bound else F.lit(dflt).cast("string")
                cond = cond & lcol.eqNullSafe(rcol)
        return cond, "bool"
    if name == "ISNUMERIC":
        _fn_arity(name, args, 1)
        kc = _meta_col(args, name, "kind", bound)
        if kc is None:
            return F.lit(False), "bool"
        v = args[0][1]
        dt = F.col(f"{v}__dt") if f"{v}__dt" in bound else F.lit(None).cast("string")
        return (kc == F.lit("literal")) & dt.isin(sorted(_NUMERIC_DTS)), "bool"
    if name == "BNODE":
        # fresh blank node per solution row; blank nodes are skolem
        # IRIs in this engine (A10)
        _fn_arity(name, args, 0)
        return F.concat(F.lit("urn:skolem:bnode:"), F.expr("uuid()")), "str"
    if name == "NOW":
        # fixed for the whole query (SPARQL 1.1 §17.4.5.1): captured on
        # the FIRST NOW() of a query compile and reused for every other
        # occurrence (ADVICE r3: per-call-site capture could straddle a
        # second boundary); top-level entrypoints reset the clock
        _fn_arity(name, args, 0)
        from datetime import datetime, timezone

        if _QUERY_NOW[0] is None:
            _QUERY_NOW[0] = datetime.now(timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%SZ"
            )
        return F.lit(_QUERY_NOW[0]), "str"
    if name == "UUID":
        _fn_arity(name, args, 0)
        return F.concat(F.lit("urn:uuid:"), F.expr("uuid()")), "str"
    if name == "STRUUID":
        _fn_arity(name, args, 0)
        return F.expr("uuid()"), "str"
    if name == "RAND":
        _fn_arity(name, args, 0)
        return F.rand(), "num"
    raise SparqlError(f"unsupported function {name}()")


def _compile_filter(spec: tuple, bound: set[str]):
    """Compile one group-pattern op to a boolean Column. Forms:
    ("expr", tree) — the full expression layer;
    ("in", var, values) — VALUES;
    ("cmp", var, op, value, numeric) — legacy internal form kept for
    synthesized constraints (DELETE WHERE constant rebinding)."""
    from pyspark.sql import functions as F

    if spec[0] == "expr":
        col, typ = _compile_expr(spec[1], bound)
        return _as_bool(col, typ)
    var = spec[1]
    if var not in bound:
        raise SparqlError(f"FILTER variable ?{var} is not bound")
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


# ---------------------------------------------------------------------------
# Dataset clauses (SPARQL 1.1 §13.2): FROM builds the query's default
# graph (merge of the listed graphs), FROM NAMED restricts the named
# graphs visible to GRAPH clauses. Compiled as a "dataset view": the
# default-graph rows are re-labelled with a reserved marker graph and
# unioned with the FROM NAMED subset, then every non-GRAPH pattern is
# rewritten to match only the marker — plain bound-graph scans, no new
# operators. Graph-bucket partition pruning is applied inside the view
# (the marker invalidates per-row bucket values, so the bucket column
# is dropped afterwards).
# ---------------------------------------------------------------------------
_DATASET_DEFAULT_G = "urn:sparql:dataset:default"


def _parse_dataset(c: _Cursor, kw: str = "FROM") -> tuple[list[str], list[str]]:
    """(FROM <g> | FROM NAMED <g>)* → (default graphs, named graphs).
    With ``kw="USING"`` parses the Update-form equivalent (§3.1.3)."""
    default: list[str] = []
    named: list[str] = []
    while _kw(c.peek(), kw):
        c.next()
        if _kw(c.peek(), "NAMED"):
            c.next()
            named.append(c.pattern_term(f"{kw} NAMED"))
        else:
            default.append(c.pattern_term(kw))
    return default, named


def _dataset_view(
    statements: DataFrame,
    default: list[str],
    named: list[str],
    n_buckets: int | None = None,
) -> DataFrame:
    from functools import reduce

    from pyspark.sql import functions as F

    cols = [col for col in statements.columns if col != "graph_bucket"]

    def restrict(graphs: list[str]) -> DataFrame:
        if not graphs:
            return statements.limit(0)
        df = statements.where(F.col("graph").isin(graphs))
        if n_buckets and "graph_bucket" in statements.columns:
            df = df.where(
                reduce(
                    lambda a, b: a | b,
                    [
                        F.col("graph_bucket")
                        == F.pmod(F.xxhash64(F.lit(g)), F.lit(n_buckets)).cast("int")
                        for g in graphs
                    ],
                )
            )
        return df

    d = restrict(default).withColumn("graph", F.lit(_DATASET_DEFAULT_G))
    return d.select(*cols).unionByName(restrict(named).select(*cols))


def _dataset_pattern(p: Pattern) -> Pattern:
    import dataclasses

    if p.g is None:
        return dataclasses.replace(p, g=_DATASET_DEFAULT_G)
    return p


def _dataset_rewrite_group(grp: tuple) -> tuple:
    """Rewrite one UNION arm for dataset-view evaluation: non-GRAPH
    patterns match the reserved default marker; GRAPH ?var patterns
    additionally filter the marker out of the variable's bindings."""
    patterns, ops, optional_blocks = grp
    new_patterns = [_dataset_pattern(p) for p in patterns]
    new_ops: list[tuple] = []
    for op in ops:
        if op[0] == "minus":
            # graph vars INSIDE the block need the marker exclusion too
            # (ADVICE r3: a default-graph triple must not bind GRAPH
            # ?var and trigger MINUS removal / satisfy EXISTS — §13.3
            # restricts GRAPH ?var to named graphs); the exclusion list
            # rides as a trailing op element applied to the sub-BGP
            bg = sorted(
                {p.g[1:] for p in op[1] if p.g is not None and p.g.startswith("?")}
            )
            new_ops.append(("minus", [_dataset_pattern(p) for p in op[1]], bg))
        elif op[0] == "exists":
            bg = sorted(
                {p.g[1:] for p in op[1] if p.g is not None and p.g.startswith("?")}
            )
            new_ops.append(
                ("exists", [_dataset_pattern(p) for p in op[1]], op[2], bg)
            )
        elif op[0] == "subquery":
            projected, sgroups, smods, sdistinct = op[1]
            new_ops.append(
                (
                    "subquery",
                    (
                        projected,
                        [_dataset_rewrite_group(g) for g in sgroups],
                        smods,
                        sdistinct,
                    ),
                )
            )
        else:
            new_ops.append(op)
    new_opts = []
    for entry in optional_blocks:
        block, bops = entry if isinstance(entry, tuple) else (entry, None)
        for p in block:
            if p.g is not None and p.g.startswith("?"):
                # the marker-exclusion filter would also drop the
                # NULL rows an unmatched OPTIONAL must keep
                raise SparqlError(
                    "GRAPH ?var inside OPTIONAL is not supported together "
                    "with FROM/FROM NAMED"
                )
        rewritten = [_dataset_pattern(p) for p in block]
        new_opts.append((rewritten, bops) if bops is not None else rewritten)
    gvars = {
        p.g[1:]
        for p in patterns
        if p.g is not None and p.g.startswith("?")
    }
    for v in sorted(gvars):
        new_ops.append(("cmp", v, "!=", _DATASET_DEFAULT_G, False))
    return new_patterns, new_ops, new_opts


def _apply_dataset(
    statements: DataFrame,
    groups: list[tuple],
    dataset: tuple[list[str], list[str]] | None,
    n_buckets: int | None,
) -> tuple[DataFrame, list[tuple], int | None]:
    """No-op without dataset clauses; else swap in the dataset view and
    the rewritten groups. n_buckets comes back None because the view
    drops the bucket column after pruning inside it."""
    if not dataset or not (dataset[0] or dataset[1]):
        return statements, groups, n_buckets
    view = _dataset_view(statements, dataset[0], dataset[1], n_buckets)
    return view, [_dataset_rewrite_group(g) for g in groups], None


def _parse_group_pattern(
    c: _Cursor,
) -> list[tuple[list[Pattern], list[tuple], list[list[Pattern]]]]:
    """WHERE { group [UNION { group }]* } where a group is triples,
    ``GRAPH g { … }``, ``OPTIONAL { … }``, ``FILTER constraint``,
    ``BIND(expr AS ?v)``, and ``VALUES ?v { constants }`` — shared by
    SELECT, CONSTRUCT, and ASK; stops after the closing brace (solution
    modifiers are parsed separately). Returns one
    ``(patterns, ops, optional_blocks)`` per UNION arm, where ops is
    the textual-order list of FILTER / BIND / VALUES operations and
    each optional block is one OPTIONAL { … } sub-BGP joined
    left-outer AS A UNIT (exact SPARQL group semantics — VERDICT r2:
    a 2-triple OPTIONAL binds both triples or neither)."""
    if not _kw(c.peek(), "WHERE"):
        raise SparqlError("expected WHERE")
    c.next()
    if c.next() != ("PUNCT", "{"):
        raise SparqlError("expected '{' after WHERE")

    def parse_one_group() -> tuple[list[Pattern], list[tuple], list[list[Pattern]]]:
        patterns: list[Pattern] = []
        ops: list[tuple] = []
        optional_blocks: list[list[Pattern]] = []
        # blank nodes in patterns are non-distinguished variables
        # (SPARQL §4.1.4): labels map consistently within the group,
        # [] and [ p o ] mint fresh ones
        bnode_state = {"n": 0, "labels": {}}

        def fresh_bnode_var() -> str:
            # single underscore: a "__" name would read as a carry_meta
            # column in bgp and be silently dropped from join keys
            bnode_state["n"] += 1
            return f"?_bn{bnode_state['n']}"

        def label_bnode_var(label: str) -> str:
            if label not in bnode_state["labels"]:
                bnode_state["labels"][label] = fresh_bnode_var()
            return bnode_state["labels"][label]

        def sub_block(
            graph_term: str | None,
            kind: str,
            collect_ops: list[tuple] | None = None,
        ) -> list[Pattern]:
            if c.next() != ("PUNCT", "{"):
                raise SparqlError(f"expected '{{' after {kind}")
            block: list[Pattern] = []
            triples_until_close(graph_term, block, sub=kind, sub_ops=collect_ops)
            if not block:
                raise SparqlError(f"empty {kind} block")
            return block

        def parse_bind(sink: list[tuple]) -> None:
            c.next()
            if c.next() != ("PUNCT", "("):
                raise SparqlError("expected '(' after BIND")
            tree = _parse_expression(c)
            if not _kw(c.next(), "AS"):
                raise SparqlError("BIND needs AS ?var")
            k, v = c.next()
            if k != "VAR":
                raise SparqlError("BIND AS needs a variable")
            if c.next() != ("PUNCT", ")"):
                raise SparqlError("unterminated BIND(...)")
            sink.append(("bind", v[1:], tree))

        def triples_until_close(
            graph_term: str | None,
            sink: list[Pattern],
            sub: str | None = None,
            sub_ops: list[tuple] | None = None,
        ) -> None:
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
                if t == ("PUNCT", "{"):
                    # subquery: { SELECT … } joins into the group on its
                    # projected variables (SPARQL 1.1 §12)
                    nxt = c.toks[c.i + 1] if c.i + 1 < len(c.toks) else None
                    if not _kw(nxt, "SELECT"):
                        raise SparqlError(
                            "nested group must be a { SELECT … } subquery"
                        )
                    if sub:
                        raise SparqlError(f"subquery inside {sub} is not supported")
                    c.next()  # '{'
                    depth, start = 1, c.i
                    while depth:
                        tk = c.next()
                        if tk == ("PUNCT", "{"):
                            depth += 1
                        elif tk == ("PUNCT", "}"):
                            depth -= 1
                    inner = _Cursor(c.toks[start : c.i - 1])
                    inner.prefixes = dict(c.prefixes)
                    ops.append(("subquery", _parse_select_cursor(inner)))
                    continue
                if t[0] == "GRAPHKW" or _kw(t, "GRAPH"):
                    if graph_term is not None:
                        raise SparqlError("nested GRAPH patterns are not supported")
                    if sub:
                        raise SparqlError(f"GRAPH inside {sub} is not supported")
                    c.next()
                    g = c.pattern_term("graph")
                    if c.next() != ("PUNCT", "{"):
                        raise SparqlError("expected '{' after GRAPH label")
                    triples_until_close(g, sink)
                    continue
                if _kw(t, "OPTIONAL"):
                    if sub:
                        raise SparqlError(f"OPTIONAL inside {sub} is not supported")
                    c.next()
                    bops: list[tuple] = []
                    block = sub_block(graph_term, "OPTIONAL", collect_ops=bops)
                    # FILTER/BIND inside the block stay scoped to the
                    # optional unit (applied BEFORE the left join)
                    optional_blocks.append((block, bops) if bops else block)
                    continue
                if _kw(t, "SERVICE"):
                    raise SparqlError(
                        "SERVICE (federated query) is not supported — this "
                        "is a single-store engine; materialize the remote "
                        "graph with LOAD first"
                    )
                if _kw(t, "MINUS"):
                    if sub:
                        raise SparqlError(f"MINUS inside {sub} is not supported")
                    c.next()
                    ops.append(("minus", sub_block(graph_term, "MINUS")))
                    continue
                if _kw(t, "FILTER"):
                    if sub == "OPTIONAL" and sub_ops is not None:
                        c.next()
                        nt = c.peek()
                        if _kw(nt, "EXISTS") or _kw(nt, "NOT"):
                            raise SparqlError(
                                "FILTER [NOT] EXISTS inside OPTIONAL is not supported"
                            )
                        sub_ops.append(("expr", _parse_constraint(c)))
                        continue
                    if sub:
                        raise SparqlError(f"FILTER inside {sub} is not supported")
                    c.next()
                    # FILTER [NOT] EXISTS { … } is a join, not an
                    # expression — dispatched to semi/anti ops
                    nt = c.peek()
                    if _kw(nt, "EXISTS"):
                        c.next()
                        ops.append(("exists", sub_block(graph_term, "EXISTS"), True))
                        continue
                    if _kw(nt, "NOT"):
                        c.next()
                        if not _kw(c.next(), "EXISTS"):
                            raise SparqlError("expected EXISTS after NOT")
                        ops.append(("exists", sub_block(graph_term, "NOT EXISTS"), False))
                        continue
                    ops.append(("expr", _parse_constraint(c)))
                    continue
                if _kw(t, "BIND"):
                    if sub == "OPTIONAL" and sub_ops is not None:
                        parse_bind(sub_ops)
                        continue
                    if sub:
                        raise SparqlError(f"BIND inside {sub} is not supported")
                    parse_bind(ops)
                    continue
                if _kw(t, "VALUES"):
                    c.next()
                    if c.peek() == ("PUNCT", "("):
                        # multi-variable form: VALUES (?a ?b) { (x y)
                        # (z UNDEF) … } — joined as an inline table
                        c.next()
                        vnames: list[str] = []
                        while c.peek() is not None and c.peek()[0] == "VAR":
                            vnames.append(c.next()[1][1:])
                        if not vnames or c.next() != ("PUNCT", ")"):
                            raise SparqlError("bad VALUES (?var …) header")
                        if c.next() != ("PUNCT", "{"):
                            raise SparqlError("expected '{' after VALUES (…)")
                        rows: list[list[str | None]] = []
                        while c.peek() != ("PUNCT", "}"):
                            if c.peek() is None:
                                raise SparqlError("unterminated VALUES block")
                            if c.next() != ("PUNCT", "("):
                                raise SparqlError("VALUES rows are '(term …)'")
                            row: list[str | None] = []
                            for _ in vnames:
                                if _kw(c.peek(), "UNDEF"):
                                    c.next()
                                    row.append(None)
                                else:
                                    row.append(c.pattern_term("VALUES"))
                            if c.next() != ("PUNCT", ")"):
                                raise SparqlError(
                                    "VALUES row arity does not match header"
                                )
                            rows.append(row)
                        c.next()
                        if not rows:
                            raise SparqlError("empty VALUES block")
                        ops.append(("values_multi", vnames, rows))
                        continue
                    k, v = c.next()
                    if k != "VAR":
                        raise SparqlError("VALUES needs a variable")
                    var = v[1:]
                    if c.next() != ("PUNCT", "{"):
                        raise SparqlError("expected '{' after VALUES ?var")
                    vals: list[str] = []
                    while c.peek() != ("PUNCT", "}"):
                        if c.peek() is None:
                            raise SparqlError("unterminated VALUES block")
                        if _kw(c.peek(), "UNDEF"):
                            # UNDEF is compatible with every binding —
                            # the constraint vanishes
                            c.next()
                            vals = None
                            break
                        vals.append(c.pattern_term("VALUES"))
                    if vals is None:
                        while c.peek() != ("PUNCT", "}"):
                            if c.peek() is None:
                                raise SparqlError("unterminated VALUES block")
                            c.next()
                    c.next()
                    if vals == []:
                        raise SparqlError("empty VALUES block")
                    if vals is not None:
                        ops.append(("in", var, vals))
                    continue
                parse_triples_same_subject(graph_term, sink)

        def term_or_bnode(
            position: str, graph_term: str | None, sink: list[Pattern]
        ) -> str:
            t = c.peek()
            if t == ("PUNCT", "["):
                c.next()
                var = fresh_bnode_var()
                if c.peek() == ("PUNCT", "]"):
                    c.next()
                    return var
                parse_predicate_object_list(var, graph_term, sink)
                if c.next() != ("PUNCT", "]"):
                    raise SparqlError("unterminated [ property list ]")
                return var
            if t is not None and t[0] == "BNODE":
                c.next()
                return label_bnode_var(t[1])
            return c.pattern_term(position)

        def parse_predicate_object_list(
            subj: str, graph_term: str | None, sink: list[Pattern]
        ) -> None:
            while True:
                p = _parse_path_expr(c)
                while True:
                    o = term_or_bnode("object", graph_term, sink)
                    sink.append(Pattern(s=subj, p=p, o=o, g=graph_term))
                    if c.peek() == ("PUNCT", ","):
                        c.next()
                        continue
                    break
                if c.peek() == ("PUNCT", ";"):
                    while c.peek() == ("PUNCT", ";"):
                        c.next()
                    nt = c.peek()
                    if nt is None or nt in (
                        ("PUNCT", "."), ("PUNCT", "}"), ("PUNCT", "]"),
                    ):
                        return  # trailing ';'
                    continue
                return

        def parse_triples_same_subject(
            graph_term: str | None, sink: list[Pattern]
        ) -> None:
            s = term_or_bnode("subject", graph_term, sink)
            nt = c.peek()
            if nt in (("PUNCT", "."), ("PUNCT", "}")) or nt is None:
                # bare [ p o ] subject with no further predicates
                return
            parse_predicate_object_list(s, graph_term, sink)

        triples_until_close(None, patterns)
        if not patterns and not any(op[0] == "subquery" for op in ops):
            raise SparqlError("empty group pattern")
        return patterns, ops, optional_blocks

    # UNION chain: WHERE { { A } UNION { B } ... } — else a single group
    # (a '{ SELECT' opener is a subquery, not a UNION arm)
    nxt = c.toks[c.i + 1] if c.i + 1 < len(c.toks) else None
    if c.peek() == ("PUNCT", "{") and not _kw(nxt, "SELECT"):
        groups: list[tuple[list[Pattern], list[tuple], list[list[Pattern]]]] = []
        while True:
            c.next()  # inner '{'
            groups.append(parse_one_group())
            if _kw(c.peek(), "UNION"):
                c.next()
                if c.peek() != ("PUNCT", "{"):
                    raise SparqlError("expected '{' after UNION")
                continue
            break
        if c.next() != ("PUNCT", "}"):
            raise SparqlError("expected '}' to close WHERE")
        return groups
    return [parse_one_group()]


def _parse_values_clause(c: _Cursor) -> tuple | None:
    """Query-final VALUES (SPARQL §10.2 ValuesClause) → a
    ``("values_multi", vars, rows)`` op joined onto the query's
    solutions before grouping (§18.2.4 algebra order)."""
    if not _kw(c.peek(), "VALUES"):
        return None
    c.next()
    t = c.peek()
    vnames: list[str] = []
    rows: list[list[str | None]] = []
    if t is not None and t[0] == "VAR":
        vnames.append(c.next()[1][1:])
        if c.next() != ("PUNCT", "{"):
            raise SparqlError("expected '{' after VALUES ?var")
        while c.peek() != ("PUNCT", "}"):
            if c.peek() is None:
                raise SparqlError("unterminated VALUES block")
            if _kw(c.peek(), "UNDEF"):
                c.next()
                rows.append([None])
            else:
                rows.append([c.pattern_term("VALUES")])
        c.next()
        return ("values_multi", vnames, rows)
    if t != ("PUNCT", "("):
        raise SparqlError("VALUES needs ?var or (?var …)")
    c.next()
    while c.peek() is not None and c.peek()[0] == "VAR":
        vnames.append(c.next()[1][1:])
    if not vnames or c.next() != ("PUNCT", ")"):
        raise SparqlError("bad VALUES (?var …) header")
    if c.next() != ("PUNCT", "{"):
        raise SparqlError("expected '{' after VALUES (…)")
    while c.peek() != ("PUNCT", "}"):
        if c.peek() is None:
            raise SparqlError("unterminated VALUES block")
        if c.next() != ("PUNCT", "("):
            raise SparqlError("VALUES rows are '(term …)'")
        row: list[str | None] = []
        for _ in vnames:
            if _kw(c.peek(), "UNDEF"):
                c.next()
                row.append(None)
            else:
                row.append(c.pattern_term("VALUES"))
        if c.next() != ("PUNCT", ")"):
            raise SparqlError("unterminated VALUES row")
        rows.append(row)
    c.next()
    return ("values_multi", vnames, rows)


def _parse_modifiers(c: _Cursor) -> dict:
    """Solution modifiers after the group pattern: GROUP BY ?v…,
    ORDER BY [ASC|DESC](?v)…, OFFSET n, LIMIT n, and a trailing
    VALUES clause — consumes to end."""
    mods: dict = {
        "group_by": [], "order_by": [], "offset": None, "limit": None,
        "having": None, "values": None,
    }
    if _kw(c.peek(), "GROUP"):
        c.next()
        if not _kw(c.next(), "BY"):
            raise SparqlError("expected BY after GROUP")
        # GroupCondition (§19.8): Var | '(' Expr ('AS' Var)? ')' |
        # BuiltInCall — expression conditions carry an alias (given or
        # synthesized) that becomes a groupable/projectable column
        while True:
            t = c.peek()
            if t is not None and t[0] == "VAR":
                mods["group_by"].append(c.next()[1][1:])
                continue
            if t == ("PUNCT", "("):
                c.next()
                tree = _parse_expression(c)
                alias = None
                if _kw(c.peek(), "AS"):
                    c.next()
                    k, v = c.next()
                    if k != "VAR":
                        raise SparqlError("GROUP BY ... AS needs a variable")
                    alias = v[1:]
                if c.next() != ("PUNCT", ")"):
                    raise SparqlError("unterminated GROUP BY ( expression )")
                if alias is None:
                    alias = f"__group{len(mods['group_by'])}"
                mods["group_by"].append(("expr", alias, tree))
                continue
            if (
                t is not None
                and t[0] in ("WORD", "KW", "SPARQL_KW", "GRAPHKW")
                and t[1].upper() in _FN_NAMES
            ):
                tree = _parse_primary(c)
                alias = f"__group{len(mods['group_by'])}"
                mods["group_by"].append(("expr", alias, tree))
                continue
            break
        if not mods["group_by"]:
            raise SparqlError("GROUP BY needs at least one condition")
    if _kw(c.peek(), "HAVING"):
        c.next()
        mods["having"] = _parse_constraint(c)
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
                tree = _parse_expression(c)
                if c.next() != ("PUNCT", ")"):
                    raise SparqlError("unterminated ASC/DESC(...)")
                key = tree[1] if tree[0] == "var" else ("expr", tree)
                mods["order_by"].append((key, asc))
                continue
            if t == ("PUNCT", "(") or (
                t[0] in ("WORD", "KW", "SPARQL_KW", "GRAPHKW")
                and t[1].upper() in _FN_NAMES
            ):
                # bare expression sort key: ORDER BY STRLEN(?s), (…)
                mods["order_by"].append((("expr", _parse_constraint(c)), True))
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
    mods["values"] = _parse_values_clause(c)
    if c.peek() is not None:
        raise SparqlError(f"trailing tokens after query: {c.peek()!r}")
    return mods


def _compile_agg(item: tuple, bound: set[str] | None = None):
    from pyspark.sql import functions as F

    _, fn, arg, distinct, alias, sep = (*item, " ")[:6]
    if isinstance(arg, tuple):
        # expression argument compiled over the pre-aggregate solution
        col, typ = _compile_expr(arg, bound or set())
        num_col = col if typ == "num" else col.cast("double")
        if fn in ("MIN", "MAX") and typ != "num":
            # a string-typed expression orders lexically — casting it
            # to double would throw under ANSI mode
            num_col = col
    elif arg == "*":
        col = num_col = None
    else:
        col = F.col(arg)
        num_col = col.cast("double")
    if fn == "COUNT":
        if col is None:
            expr = F.count(F.lit(1))
        elif distinct:
            expr = F.count_distinct(col)
        else:
            expr = F.count(col)
        return expr.alias(alias)
    if fn == "SAMPLE":
        # SPARQL SAMPLE = any value of the group; min is a valid and
        # DETERMINISTIC sample (F.first varies with partitioning)
        return F.min(col).alias(alias)
    if fn == "GROUP_CONCAT":
        vals = F.collect_set(col) if distinct else F.collect_list(col)
        # SPARQL leaves concatenation order undefined; sorting makes the
        # result partitioning-invariant (deterministic across runs)
        return F.array_join(F.array_sort(vals), sep).alias(alias)
    if distinct and fn == "SUM":
        return F.sum_distinct(num_col).alias(alias)
    if distinct and fn == "AVG":
        # AVG(DISTINCT x) = SUM(DISTINCT x) / COUNT(DISTINCT x);
        # try_divide yields NULL for the empty group exactly like AVG
        return F.try_divide(
            F.sum_distinct(num_col), F.count_distinct(num_col)
        ).alias(alias)
    # MIN/MAX: DISTINCT is the identity (SPARQL 1.1 §18.4.1 set
    # semantics change nothing for extrema) — compile as plain
    fns = {"SUM": F.sum, "AVG": F.avg, "MIN": F.min, "MAX": F.max}
    return fns[fn](num_col).alias(alias)


def _extract_having_aggs(tree: tuple, acc: list[tuple]) -> tuple:
    """Rewrite aggregate calls inside a HAVING expression into
    references to synthesized aggregate columns (computed alongside
    the projected aggregates, dropped by the final projection)."""
    if not isinstance(tree, tuple):
        return tree
    if tree[0] == "aggfn":
        _, fn, arg, distinct = tree
        alias = f"__hagg{len(acc)}"
        acc.append(("agg", fn, arg, distinct, alias, " "))
        return ("var", alias)
    out = [tree[0]]
    for a in tree[1:]:
        if isinstance(a, tuple):
            out.append(_extract_having_aggs(a, acc))
        elif isinstance(a, list):
            out.append([_extract_having_aggs(x, acc) for x in a])
        else:
            out.append(a)
    return tuple(out)


def select(
    statements: DataFrame,
    text: str,
    allow_cartesian: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Execute a SPARQL SELECT string against a statement DataFrame.

    Supports projection of variables and aggregates
    ``(COUNT/SUM/AVG/MIN/MAX/SAMPLE/GROUP_CONCAT(...) AS ?alias)`` with
    GROUP BY / HAVING, plus ORDER BY / OFFSET / LIMIT solution
    modifiers. Numeric aggregates cast the bound lexical to double
    (SPARQL numeric semantics over this engine's string-lexical object
    column)."""
    _reset_query_clock()
    parsed = parse_select(text)
    return _compile_select(
        statements, parsed, allow_cartesian=allow_cartesian, n_buckets=n_buckets
    )


def _compile_select(
    statements: DataFrame,
    parsed: tuple,
    allow_cartesian: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    projected, groups, mods, distinct = parsed
    statements, groups, n_buckets = _apply_dataset(
        statements, groups, mods.get("dataset"), n_buckets
    )
    exprprojs = [it for it in projected if it[0] == "exprproj"]
    group_exprs = [g for g in mods["group_by"] if isinstance(g, tuple)]
    out = _solutions(
        statements, groups, allow_cartesian=allow_cartesian, n_buckets=n_buckets,
        carry_meta=any(
            _expr_needs_meta(t)
            for t in (
                [it[2] for it in exprprojs] + [g[2] for g in group_exprs]
            )
        ),
    )
    if mods.get("values") is not None:
        # query-final VALUES joins before grouping (§18.2.4 order)
        out = _apply_ops(out, [mods["values"]])
    bound = set(out.columns)
    aggs = [it for it in projected if it[0] == "agg"]
    plain = [it[1] for it in projected if it[0] == "var"]
    group_aliases = {
        g[1] for g in mods["group_by"] if isinstance(g, tuple)
    }
    missing = [v for v in plain if v not in bound and v not in group_aliases] + [
        it[2]
        for it in aggs
        if isinstance(it[2], str) and it[2] != "*" and it[2] not in bound
    ]
    if missing:
        raise SparqlError(f"projected variables not bound: {missing}")
    if mods["having"] is not None and not (aggs or mods["group_by"]):
        raise SparqlError("HAVING requires GROUP BY / aggregates")
    drop_after_order: list[str] = []
    if aggs or mods["group_by"]:
        if exprprojs:
            raise SparqlError(
                "expression projections are not supported together with "
                "aggregates/GROUP BY"
            )
        # expression group conditions materialize as alias columns
        # ahead of the aggregate (SPARQL §19.8 GroupCondition)
        group: list[str] = []
        for gitem in mods["group_by"]:
            if isinstance(gitem, tuple):
                _, alias, tree = gitem
                col, _ = _compile_expr(tree, set(out.columns))
                out = out.withColumn(alias, col)
                group.append(alias)
            else:
                group.append(gitem)
        stray = [v for v in plain if v not in group]
        if stray:
            raise SparqlError(
                f"non-aggregate projection {stray} must appear in GROUP BY"
            )
        bad_group = [v for v in group if v not in set(out.columns)]
        if bad_group:
            raise SparqlError(f"GROUP BY variables not bound: {bad_group}")
        pre_bound = set(out.columns)
        htree = mods["having"]
        extra_aggs: list[tuple] = []
        if htree is not None:
            # direct aggregate calls in HAVING become synthesized
            # aggregate columns, dropped by the final projection
            htree = _extract_having_aggs(htree, extra_aggs)
        # same rewrite for aggregate calls in ORDER BY expression keys
        new_ob = []
        for key, asc_ in mods["order_by"]:
            if isinstance(key, tuple) and key[0] == "expr":
                key = ("expr", _extract_having_aggs(key[1], extra_aggs))
            new_ob.append((key, asc_))
        mods["order_by"] = new_ob
        agg_exprs = [_compile_agg(it, pre_bound) for it in aggs] + [
            _compile_agg(it, pre_bound) for it in extra_aggs
        ]
        if not agg_exprs:
            raise SparqlError("GROUP BY without any aggregate projection")
        out = out.groupBy(*group).agg(*agg_exprs) if group else out.agg(*agg_exprs)
        if htree is not None:
            # HAVING sees the aggregate aliases as bound variables
            col, typ = _compile_expr(htree, set(out.columns))
            out = out.where(_as_bool(col, typ))
        # project in the user's order, carrying synthesized sort-key
        # aggregates through to ORDER BY (dropped after sorting)
        names = [it[1] if it[0] == "var" else it[4] for it in projected]
        drop_after_order.extend(a[4] for a in extra_aggs)
        out = out.select(*names, *drop_after_order)
    elif projected:
        for it in exprprojs:
            _, alias, tree = it
            if alias in out.columns:
                raise SparqlError(f"projection alias ?{alias} is already bound")
            col, _ = _compile_expr(tree, set(out.columns))
            out = out.withColumn(alias, col)
        out = out.select(*[it[1] for it in projected])
    else:
        # SELECT *: project every binding, never the carry_meta
        # companion columns nor non-distinguished blank-node variables
        out = out.select(
            *[c for c in out.columns
              if not c.endswith(("__kind", "__dt", "__lang"))
              and not re.fullmatch(r"_bn\d+", c)]
        )
    if distinct:
        # key on the USER-projected columns only: synthesized ORDER
        # BY/HAVING aggregate carriers (__haggN) must not stop a
        # spec-conforming SELECT DISTINCT from collapsing rows whose
        # projection omits some GROUP BY keys (ADVICE r3)
        user_cols = [c for c in out.columns if c not in drop_after_order]
        out = out.dropDuplicates(user_cols)
    if mods["order_by"]:
        from pyspark.sql import functions as F

        cols = set(out.columns)
        bad = [
            v for v, _ in mods["order_by"]
            if isinstance(v, str) and v not in cols
        ]
        if bad:
            raise SparqlError(f"ORDER BY variables not in projection: {bad}")
        keys = []
        for v, asc_ in mods["order_by"]:
            col = (
                F.col(v) if isinstance(v, str)
                else _compile_expr(v[1], cols)[0]
            )
            keys.append(col.asc() if asc_ else col.desc())
        out = out.orderBy(*keys)
    if drop_after_order:
        out = out.drop(*drop_after_order)
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

    _reset_query_clock()

    c = _Cursor(_tokenize(text))
    c.prologue()
    if not _kw(c.peek(), "ASK"):
        raise SparqlError("expected ASK")
    c.next()
    dataset = _parse_dataset(c)
    # ASK's group pattern is WHERE-optional in SPARQL; accept both
    if not _kw(c.peek(), "WHERE"):
        c.toks.insert(c.i, ("WORD", "WHERE"))
    groups = _parse_group_pattern(c)
    _parse_modifiers(c)  # tolerate (and ignore) trailing modifiers
    statements, groups, n_buckets = _apply_dataset(
        statements, groups, dataset, n_buckets
    )
    sol = _solutions(
        statements, groups, allow_cartesian=allow_cartesian, n_buckets=n_buckets
    )
    return sol.limit(1).agg((F.count(F.lit(1)) > 0).alias("ask"))


def describe(
    statements: DataFrame,
    text: str,
    allow_cartesian: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """SPARQL DESCRIBE (§16.4): every statement whose subject — or IRI
    object — is one of the described resources, as a statement-shaped
    DataFrame. Resources come from explicit IRIs and/or the bindings of
    DESCRIBE'd variables in the WHERE clause (RDF4J's default
    subject+object description, the reference's behavior). The resource
    set is a small DataFrame broadcast into two semi-joins — the store
    is scanned, never collected."""
    from pyspark.sql import functions as F

    _reset_query_clock()
    c = _Cursor(_tokenize(text))
    c.prologue()
    if not _kw(c.peek(), "DESCRIBE"):
        raise SparqlError("expected DESCRIBE")
    c.next()
    iris: list[str] = []
    dvars: list[str] = []
    star = False
    while True:
        t = c.peek()
        if t is None or _kw(t, "WHERE"):
            break
        if t[0] == "VAR":
            dvars.append(c.next()[1][1:])
            continue
        if t[0] == "STAR":
            # DESCRIBE * (§16.4 grammar): all in-scope variables of the
            # WHERE clause — resolved after the solutions are computed
            c.next()
            star = True
            continue
        term = c.pattern_term("DESCRIBE")
        iris.append(term)
    if not iris and not dvars and not star:
        raise SparqlError("DESCRIBE needs at least one IRI, variable, or *")
    spark = statements.sparkSession
    parts: list[DataFrame] = []
    if iris:
        parts.append(spark.createDataFrame([(i,) for i in iris], "r string"))
    if dvars or star:
        if c.peek() is None:
            raise SparqlError(
                "DESCRIBE * needs a WHERE clause" if star
                else "DESCRIBE ?var needs a WHERE clause"
            )
        groups = _parse_group_pattern(c)
        _parse_modifiers(c)
        sol = _solutions(
            statements, groups, allow_cartesian=allow_cartesian,
            n_buckets=n_buckets,
        )
        if star:
            # same visibility rule as SELECT *: user variables only,
            # never carry_meta companions or non-distinguished bnodes
            dvars = sorted(
                set(dvars)
                | {
                    col for col in sol.columns
                    if not col.endswith(("__kind", "__dt", "__lang"))
                    and not re.fullmatch(r"_bn\d+", col)
                }
            )
        missing = [v for v in dvars if v not in sol.columns]
        if missing:
            raise SparqlError(f"DESCRIBE variables not bound: {missing}")
        for v in dvars:
            parts.append(sol.select(F.col(v).alias("r")))
    elif c.peek() is not None:
        raise SparqlError(f"trailing tokens after DESCRIBE: {c.peek()!r}")
    resources = parts[0]
    for p in parts[1:]:
        resources = resources.unionByName(p)
    resources = resources.where(F.col("r").isNotNull()).dropDuplicates()
    cols = [
        f for f in ("subj", "pred", "obj", "obj_kind", "obj_dt", "obj_lang", "graph")
        if f in statements.columns
    ]
    by_subj = statements.join(
        F.broadcast(resources), statements["subj"] == resources["r"], "left_semi"
    )
    by_obj = statements.where(F.col("obj_kind") == "iri").join(
        F.broadcast(resources), statements["obj"] == resources["r"], "left_semi"
    )
    return by_subj.select(*cols).unionByName(by_obj.select(*cols)).dropDuplicates()


def query(
    statements: DataFrame,
    text: str,
    allow_cartesian: bool = False,
    n_buckets: int | None = None,
) -> DataFrame:
    """Dispatch a SPARQL query string: SELECT → bindings table,
    CONSTRUCT/DESCRIBE → statement-shaped DataFrame, ASK → boolean.
    Pass the catalog's ``n_buckets`` so bound-graph patterns
    partition-prune."""
    c = _Cursor(_tokenize(text))
    c.prologue()
    if _kw(c.peek(), "SELECT"):
        return select(statements, text, allow_cartesian=allow_cartesian, n_buckets=n_buckets)
    if _kw(c.peek(), "CONSTRUCT"):
        return construct(statements, text, allow_cartesian=allow_cartesian, n_buckets=n_buckets)
    if _kw(c.peek(), "ASK"):
        return ask(statements, text, allow_cartesian=allow_cartesian, n_buckets=n_buckets)
    if _kw(c.peek(), "DESCRIBE"):
        return describe(statements, text, allow_cartesian=allow_cartesian, n_buckets=n_buckets)
    raise SparqlError(
        "only SELECT, CONSTRUCT, ASK, and DESCRIBE query forms are supported"
    )


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
    """→ (template triples, UNION groups, limit, dataset clauses)."""
    c = _Cursor(_tokenize(text))
    c.prologue()
    if not _kw(c.peek(), "CONSTRUCT"):
        raise SparqlError("expected CONSTRUCT")
    c.next()
    if _kw(c.peek(), "WHERE") or _kw(c.peek(), "FROM"):
        # CONSTRUCT WHERE { … } shorthand (§16.2.1): the WHERE pattern
        # doubles as the template. The brace block is parsed twice —
        # once as a template (typed terms) and once as the evaluation
        # group — because pattern terms erase literal datatypes while
        # template terms must keep them.
        dataset = _parse_dataset(c)
        if not _kw(c.peek(), "WHERE"):
            raise SparqlError("expected WHERE in CONSTRUCT WHERE")
        where_start = c.i
        c.next()
        if c.next() != ("PUNCT", "{"):
            raise SparqlError("expected '{' after WHERE")
        depth, inner_start = 1, c.i
        while depth:
            tk = c.next()  # raises at end = unterminated block
            if tk == ("PUNCT", "{"):
                depth += 1
            elif tk == ("PUNCT", "}"):
                depth -= 1
        end = c.i
        mods = _parse_modifiers(c)
        if mods["group_by"] or mods["order_by"] or mods["offset"]:
            raise SparqlError("CONSTRUCT supports only the LIMIT modifier")
        tc = _Cursor(c.toks[inner_start : end - 1])
        tc.prefixes = dict(c.prefixes)
        template = []
        while tc.peek() is not None:
            if tc.peek() == ("PUNCT", "."):
                tc.next()
                continue
            s = _template_term(tc, "subject")
            p = _template_term(tc, "predicate")
            o = _template_term(tc, "object")
            template.append((s, p, o, None))
        if not template:
            raise SparqlError("empty CONSTRUCT WHERE pattern")
        gc = _Cursor(c.toks[where_start:end])
        gc.prefixes = dict(c.prefixes)
        groups = _parse_group_pattern(gc)
        patterns, gops, gopts = groups[0]
        if len(groups) > 1 or gops or gopts or any(
            isinstance(pt.p, tuple) or pt.g is not None for pt in patterns
        ):
            raise SparqlError(
                "CONSTRUCT WHERE allows only plain default-graph triple "
                "patterns (no UNION/OPTIONAL/FILTER/GRAPH/paths)"
            )
        return template, groups, mods["limit"], dataset
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
    dataset = _parse_dataset(c)
    groups = _parse_group_pattern(c)
    mods = _parse_modifiers(c)
    if mods["group_by"] or mods["order_by"] or mods["offset"]:
        raise SparqlError("CONSTRUCT supports only the LIMIT modifier")
    return template, groups, mods["limit"], dataset


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

    _reset_query_clock()
    template, groups, limit, dataset = parse_construct(text)
    statements, groups, n_buckets = _apply_dataset(
        statements, groups, dataset, n_buckets
    )
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
        if g is not None and g[0] == "var" and not g[1].startswith("__g"):
            # a user-written GRAPH ?g template var bound to null is an
            # unbound term → no statement; the SYNTHETIC ?__gN binders
            # from _delete_where_compile legitimately carry null = the
            # default graph, which the delete must target
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
        if isinstance(pt.p, tuple):
            raise SparqlError("property paths are not allowed in DELETE WHERE")
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


# IRIREF per SPARQL grammar: no spaces, quotes, braces, <, >, etc.
# between the angle brackets (used to disambiguate '<' from less-than)
_IRIREF_AT_RE = re.compile(r"<[^<>\"{}|^`\\\x00-\x20]*>")


def _split_update_sequence(text: str) -> list[str]:
    """Split an update request on top-level ``;`` separators (§3.1
    UpdateUnit := Update (';' Update)*), respecting brace/paren depth,
    all four string-literal quote forms, IRIREFs, and comments."""
    parts: list[str] = []
    depth = 0
    i = start = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "#":
            while i < n and text[i] != "\n":
                i += 1
        elif ch == "<" and _IRIREF_AT_RE.match(text, i):
            # only an actual IRIREF opens a <...> scan — a bare '<' is a
            # comparison operator (ADVICE r3: 'FILTER(?o < 5) } ; ...'
            # swallowed text to the next '>' and skipped the separator)
            j = text.find(">", i + 1)
            i = n if j < 0 else j
        elif ch in "\"'":
            q = ch
            if text[i : i + 3] == q * 3:
                j = text.find(q * 3, i + 3)
                i = n if j < 0 else j + 2
            else:
                i += 1
                while i < n and text[i] != q:
                    if text[i] == "\\":
                        i += 1
                    i += 1
        elif ch in "{(":
            depth += 1
        elif ch in "})":
            depth -= 1
        elif ch == ";" and depth == 0:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    parts.append(text[start:])
    return [p for p in parts if p.strip()]


_PROLOGUE_RE = re.compile(
    r"^(?:\s*(?:PREFIX\s+\S+\s*<[^>]*>|BASE\s*<[^>]*>))*\s*",
    re.IGNORECASE,
)


def execute_update(
    spark: SparkSession, catalog, text: str, run_id: str | None = None
) -> int:
    """Parse and execute one SPARQL 1.1 update string against the
    catalog; returns the committed snapshot id. Forms:

    - ``[WITH <g>] INSERT DATA { quads }`` / ``DELETE DATA { quads }``
    - ``[WITH <g>] DELETE WHERE { patterns }``
    - ``[WITH <g>] [DELETE {tmpl}] [INSERT {tmpl}] WHERE { patterns }
      [USING [NAMED] <g> …]`` (one atomic snapshot; deletes then
      inserts, both against the pre-update store — SPARQL 1.1 §3.1.3)
    - ``LOAD <file-uri-or-path> [INTO GRAPH <g>]`` — the reference
      loader's core operation: parse RDF files from storage and commit
    - an ``op1 ; op2 ; …`` sequence — each operation sees the previous
      one's result (sequential snapshots; §3.1 UpdateUnit)
    """
    _reset_query_clock()
    segments = _split_update_sequence(text)
    if len(segments) > 1:
        # the request prologue (PREFIX/BASE) scopes the whole sequence
        prologue = _PROLOGUE_RE.match(segments[0]).group(0)
        sid = 0
        for k, seg in enumerate(segments):
            full = seg if k == 0 else prologue + seg
            rid = f"{run_id}-{k}" if run_id is not None else None
            sid = execute_update(spark, catalog, full, run_id=rid)
        return sid
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
        where_dataset: tuple[list[str], list[str]] | None = None
        if op == "delete" and _kw(nxt, "WHERE"):
            groups = _parse_group_pattern(c)
            if len(groups) > 1:
                raise SparqlError("UNION is not supported in updates")
            patterns, ops, opt_blocks = groups[0]
            if opt_blocks:
                raise SparqlError("OPTIONAL is not allowed in DELETE WHERE")
            _parse_modifiers(c)
            patterns, delete_tmpl, extra = _delete_where_compile(patterns, with_graph)
            ops = ops + extra
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
            using = _parse_dataset(c, kw="USING")
            groups = _parse_group_pattern(c)
            if len(groups) > 1:
                raise SparqlError("UNION is not supported in updates")
            patterns, ops, opt_blocks = groups[0]
            _parse_modifiers(c)
            if using[0] or using[1]:
                # USING/USING NAMED scope the WHERE evaluation (and
                # override WITH there — SPARQL 1.1 §3.1.3); WITH still
                # provides the templates' default graph
                where_dataset = using
            elif with_graph is not None:
                patterns = [
                    Pattern(s=pt.s, p=pt.p, o=pt.o, g=pt.g or with_graph)
                    for pt in patterns
                ]
                opt_blocks = [
                    (
                        [Pattern(s=pt.s, p=pt.p, o=pt.o, g=pt.g or with_graph)
                         for pt in e[0]],
                        e[1],
                    )
                    if isinstance(e, tuple)
                    else [
                        Pattern(s=pt.s, p=pt.p, o=pt.o, g=pt.g or with_graph)
                        for pt in e
                    ]
                    for e in opt_blocks
                ]
        store = catalog.read_statements()
        nb = getattr(catalog, "n_buckets", None)
        if where_dataset is not None:
            store, rewritten, nb = _apply_dataset(
                store, [(patterns, ops, opt_blocks)], where_dataset, nb
            )
            patterns, ops, opt_blocks = rewritten[0]
        sol = bgp(
            store, patterns, carry_meta=True, n_buckets=nb,
            optional_groups=[
                (e[0], _optional_ops_transform(e[1]))
                if isinstance(e, tuple)
                else e
                for e in opt_blocks
            ],
        )
        sol = _apply_ops(sol, ops, statements=store, n_buckets=nb)
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
