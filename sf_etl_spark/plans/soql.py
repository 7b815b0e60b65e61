"""SOQL-subset → DataFrame compiler.

The reference never evaluates SOQL — the string is built
(``client.rs:217``) or passed through (``client.rs:199-205``) and
Salesforce runs it server-side. A self-contained engine needs to run
those queries itself; per SURVEY §4, the right Spark shape is a
**pre-Catalyst string compiler**: parse SOQL, emit declarative
DataFrame ops, and let Catalyst do all optimization (pushdown,
pruning, join selection). No custom planner, no Catalyst rules.

Supported subset:

* ``SELECT`` field list, aggregates (``COUNT()``, ``COUNT(f)``,
  ``COUNT_DISTINCT(f)``, ``SUM/AVG/MIN/MAX``) with optional aliases
* **Parent-to-child nested subqueries** (``SELECT x, (SELECT y FROM
  Children [WHERE][ORDER BY][LIMIT]) FROM Parent``): each child rel
  compiles to one child-side aggregation
  (``sort_array(collect_list(struct))``) LEFT-joined on the parent
  PK — per-parent nested lists in one shuffle, NULL when childless
  (the Salesforce wire shape). The reference forwards these opaquely
  (``client.rs:199-205``); here they execute locally.
* **Child-to-parent relationship traversal** (``Rel.Field`` dotted
  paths, MULTI-HOP: ``Rel.Rel.Field`` chains join hop by hop): each
  distinct chain prefix compiles to one LEFT join against its parent
  object — dims broadcast under the session threshold, exactly how
  Salesforce's ``Reference`` fields (``relationship_name``, SURVEY
  §1.2) should execute locally. Output columns are named
  ``rel_field`` / ``rel_rel_field``.
* ``WHERE`` — ``AND/OR/NOT``, comparisons, ``IN / NOT IN`` (literal
  lists, and ``[NOT] IN (SELECT f FROM Object [WHERE ...])``
  semi-join subqueries compiled to LeftSemi/LeftAnti joins as
  top-level conjuncts), ``LIKE``, ``INCLUDES/EXCLUDES``
  (multipicklist membership on ``;``-joined wire strings or ingested
  array columns), ``= null`` / ``!= null``
* SOQL date literals with Salesforce **range semantics** (a literal
  denotes a day/month/year span, not an instant: ``f = TODAY`` ⇔
  within today; ``f > LAST_MONTH`` ⇔ after that month's end):
  ``TODAY``, ``YESTERDAY``, ``THIS_MONTH``, ``LAST_MONTH``,
  ``THIS_YEAR``, ``LAST_N_DAYS:n``, ``NEXT_N_DAYS:n``
* ``GROUP BY`` [``ROLLUP(...)``] / ``HAVING`` (aggregate predicates)
  / ``ORDER BY ... [ASC|DESC] [NULLS FIRST|LAST]`` / ``LIMIT`` /
  ``OFFSET``
* ``TYPEOF`` polymorphic-reference dispatch (``TYPEOF Rel WHEN Obj
  THEN f1, f2 ... END``): one type-gated left join per WHEN branch
  against a declared polymorphic registry; ``ELSE`` (the Salesforce
  ``Name`` pseudo-object) is a documented ``SoqlError``

SOQL's documented default null ordering (NULLS FIRST) is applied
explicitly so results are engine-stable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


class SoqlError(ValueError):
    """Parse or compile failure, with position context."""


def _norm(name: str) -> str:
    """Flat output name for a (possibly dotted) SOQL field path."""
    return name.replace(".", "_").lower() if "." in name else name


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<datelit>(?:LAST_N_DAYS|NEXT_N_DAYS):\d+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<punct><=|>=|!=|<>|=|<|>|\(|\)|,)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "offset", "and", "or", "not", "in", "like", "asc", "desc", "nulls",
    "first", "last", "null", "true", "false", "includes", "excludes",
}

_AGG_FNS = {"count", "count_distinct", "sum", "avg", "min", "max", "grouping"}

#: SOQL date functions (SELECT / GROUP BY scalar position) → Spark
#: builtins. Salesforce evaluates these server-side on date/datetime
#: fields; a self-contained engine maps them onto Catalyst's.
_DATE_FNS = {
    "calendar_year": "year",
    "calendar_month": "month",
    "calendar_quarter": "quarter",
    "day_in_month": "dayofmonth",
    "day_in_year": "dayofyear",
    "day_in_week": "dayofweek",
    "week_in_year": "weekofyear",
    "hour_in_day": "hour",
}


@dataclass
class Tok:
    kind: str  # 'string' | 'number' | 'datelit' | 'ident' | 'punct' | 'kw'
    text: str
    pos: int


def _tokenize(soql: str) -> list[Tok]:
    toks, i = [], 0
    while i < len(soql):
        m = _TOKEN_RE.match(soql, i)
        if not m:
            raise SoqlError(f"unexpected character {soql[i]!r} at position {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "ident" and text.lower() in _KEYWORDS:
            toks.append(Tok("kw", text.lower(), m.start()))
        else:
            toks.append(Tok(kind, text, m.start()))
    return toks


# ---------------------------------------------------------------------------
# Parser — emits Catalyst Columns directly; Catalyst's expression tree
# IS the AST, which is the point of a pre-Catalyst front door.
# ---------------------------------------------------------------------------


@dataclass
class _ChildQuery:
    """A parent-to-child nested subquery: ``(SELECT f... FROM Rel
    [WHERE ...] [ORDER BY ...] [LIMIT n])`` in the select list."""

    fields: list[str]
    rel: str
    where: Column | None
    order: list[tuple[str, bool]]  # (field, is_desc)
    limit: int | None


@dataclass
class _SelectItem:
    col: Column
    name: str
    is_agg: bool
    src: str | None = None  # raw field path for non-aggregates
    child: _ChildQuery | None = None


class _Parser:
    def __init__(
        self,
        toks: list[Tok],
        df: DataFrame | None,
        polymorphic: dict | None = None,
        base_fields: list[str] | None = None,
    ):
        self.toks = toks
        self.i = 0
        self.df = df
        # the queried object's OWN columns in schema order, captured
        # before relationship-chain joins widen the frame — what
        # FIELDS(ALL) expands to
        self.base_fields = base_fields
        # aggregates referenced by HAVING, hoisted into the agg step as
        # hidden columns (Spark can't filter on an aggregate post-agg)
        self.having_aggs: list[Column] = []
        self.in_having = False
        # `field [NOT] IN (SELECT ...)` conjuncts, lifted out of the
        # WHERE tree and compiled as semi/anti joins (a subquery is a
        # plan, not a Column): list of dicts, see parse_predicate
        self.semi_joins: list[dict] = []
        self._last_lhs: str | None = None
        # polymorphic-reference registry for TYPEOF (see parse_typeof);
        # (rel, object) branches used by the query, each becoming one
        # type-gated left join in soql_to_df
        self.polymorphic = polymorphic
        self.typeof_joins: list[tuple[str, str]] = []

    # -- token helpers -----------------------------------------------------

    def peek(self, offset: int = 0) -> Tok | None:
        j = self.i + offset
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Tok:
        if self.i >= len(self.toks):
            raise SoqlError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> Tok | None:
        t = self.peek()
        if t and t.kind == kind and (text is None or t.text == text):
            self.i += 1
            return t
        return None

    def expect(self, kind: str, text: str | None = None) -> Tok:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise SoqlError(
                f"expected {text or kind}, got {got.text if got else 'end of query'}"
            )
        return t

    # -- select list -------------------------------------------------------

    def parse_select_list(self) -> list[_SelectItem]:
        items = self._parse_select_entry()
        while self.accept("punct", ","):
            items.extend(self._parse_select_entry())
        return items

    def _parse_select_entry(self) -> list[_SelectItem]:
        # a TYPEOF block expands to one item per branch field, a
        # FIELDS(ALL) call to one item per base column; every other
        # select entry is exactly one item
        if self._at_typeof():
            return self.parse_typeof()
        if self._at_fields_fn():
            return self.parse_fields_fn()
        return [self.parse_select_item()]

    def _at_fields_fn(self) -> bool:
        t, nxt = self.peek(), self.peek(1)
        return bool(
            t
            and t.kind == "ident"
            and t.text.lower() == "fields"
            and nxt
            and nxt.kind == "punct"
            and nxt.text == "("
        )

    def parse_fields_fn(self) -> list[_SelectItem]:
        """``FIELDS(ALL)`` / ``FIELDS(STANDARD)``: expand to every
        column of the queried object, in schema order (Salesforce's
        bulk-projection shorthand). The local schema has no
        custom-field distinction, so STANDARD ≡ ALL here;
        ``FIELDS(CUSTOM)`` raises a documented error. Expansion
        happens at PARSE time, so downstream (grouping validation,
        child subqueries, ORDER BY) sees ordinary select items —
        exactly as if the user had typed the list."""
        self.expect("ident")  # fields
        self.expect("punct", "(")
        scope_t = self.next()
        scope = scope_t.text.lower()
        self.expect("punct", ")")
        if scope == "custom":
            raise SoqlError(
                "FIELDS(CUSTOM) is not supported: the local schema has no "
                "custom-field metadata (use FIELDS(ALL) or an explicit list)"
            )
        if scope not in ("all", "standard"):
            raise SoqlError(f"FIELDS({scope_t.text}) is not a valid FIELDS scope")
        if not self.base_fields:
            raise SoqlError("FIELDS(ALL) requires a resolvable FROM object")
        return [
            _SelectItem(F.col(c).alias(_norm(c)), _norm(c), False, c)
            for c in self.base_fields
        ]

    def parse_select_item(self) -> _SelectItem:
        if self._at_child_subquery():
            return self.parse_child_subquery()
        src = None
        if self._at_aggregate():
            col, default_name = self.parse_aggregate()
            is_agg = True
        elif self._at_date_fn():
            col, src = self.parse_date_fn()
            default_name = src.replace("(", "_").replace(")", "").replace(".", "_")
            is_agg = False
        else:
            t = self.expect("ident")
            col, default_name, is_agg = F.col(t.text), _norm(t.text), False
            src = t.text
        alias = self.accept("ident")
        name = alias.text if alias else default_name
        return _SelectItem(col.alias(name), name, is_agg, src)

    def _at_date_fn(self) -> bool:
        t, nxt = self.peek(), self.peek(1)
        return bool(
            t
            and t.kind == "ident"
            and t.text.lower() in _DATE_FNS
            and nxt
            and nxt.kind == "punct"
            and nxt.text == "("
        )

    def parse_date_fn(self) -> tuple[Column, str]:
        """``CALENDAR_YEAR(field)``-style scalar date function. Returns
        the Spark column and the canonical text ``fn(field)`` that a
        matching GROUP BY entry parses to — text equality is how the
        grouped/select pairing resolves."""
        fn = self.next().text.lower()
        self.expect("punct", "(")
        field = self.expect("ident").text
        self.expect("punct", ")")
        col = getattr(F, _DATE_FNS[fn])(F.col(field)).cast("int")
        return col, f"{fn}({field})"

    def _at_typeof(self) -> bool:
        t, nxt = self.peek(), self.peek(1)
        return bool(
            t
            and t.kind == "ident"
            and t.text.lower() == "typeof"
            and nxt
            and nxt.kind == "ident"
        )

    def parse_typeof(self) -> list[_SelectItem]:
        """``TYPEOF Rel WHEN Obj THEN f1, f2 [WHEN Obj2 THEN ...] END``
        — SOQL's polymorphic-reference dispatch (Salesforce: a lookup
        that can target several objects, e.g. ``Task.What``).

        Local semantics: the polymorphic registry declares, per
        relationship, the FK column, a type-discriminator column on the
        base object (holding the target object name per row), and the
        admissible targets with their PKs. Each WHEN branch compiles to
        ONE type-gated left join (``fk = pk AND type = 'Obj'``); branch
        fields surface as ``rel_field`` columns, NULL on rows of any
        other type — the flat projection of the Salesforce wire shape.
        Catalyst broadcasts the dimension sides as usual.

        ``ELSE`` is not supported: its fields resolve against the
        generic ``Name`` pseudo-object, which has no local analog —
        a documented SoqlError, not silent misbehavior.
        """
        self.next()  # TYPEOF
        rel = self.expect("ident").text
        if not self.polymorphic or rel not in self.polymorphic:
            raise SoqlError(
                f"TYPEOF relationship {rel!r} is not declared in the polymorphic "
                f"registry (known: {sorted(self.polymorphic or {})})"
            )
        spec = self.polymorphic[rel]
        # output name -> branch columns, in first-appearance order. The
        # same field selected in SEVERAL branches (the canonical usage:
        # WHEN Lead THEN name WHEN Contact THEN name) must produce ONE
        # column, not duplicates: branches are type-gated and mutually
        # exclusive per row, so coalescing the branch columns is exactly
        # the Salesforce wire value for that row's actual type.
        by_name: dict[str, list[Column]] = {}
        saw_when = False
        while True:
            t = self.peek()
            if t and t.kind == "ident" and t.text.lower() == "when":
                self.next()
                obj = self.expect("ident").text
                if obj not in spec["targets"]:
                    raise SoqlError(
                        f"TYPEOF {rel}: object {obj!r} is not an admissible target "
                        f"(declared: {sorted(spec['targets'])})"
                    )
                saw_when = True
                nxt = self.peek()
                if not (nxt and nxt.kind == "ident" and nxt.text.lower() == "then"):
                    raise SoqlError(f"expected THEN after TYPEOF WHEN {obj}")
                self.next()  # THEN
                alias = f"__typeof_{rel}_{obj}"
                self.typeof_joins.append((rel, obj))
                fields = [self.expect("ident").text]
                while self.accept("punct", ","):
                    fields.append(self.expect("ident").text)
                for f in fields:
                    name = f"{rel}_{f}".lower()
                    by_name.setdefault(name, []).append(F.col(f"{alias}.{f}"))
            elif t and t.kind == "ident" and t.text.lower() == "else":
                raise SoqlError(
                    "TYPEOF ELSE is not supported: its fields resolve against the "
                    "Salesforce 'Name' pseudo-object, which has no local analog"
                )
            elif t and t.kind == "ident" and t.text.lower() == "end":
                self.next()
                if not saw_when:
                    raise SoqlError("TYPEOF requires at least one WHEN branch")
                return [
                    _SelectItem(
                        (cols[0] if len(cols) == 1 else F.coalesce(*cols)).alias(
                            name
                        ),
                        name,
                        is_agg=False,
                    )
                    for name, cols in by_name.items()
                ]
            else:
                raise SoqlError(
                    f"expected WHEN/END in TYPEOF, got "
                    f"{t.text if t else 'end of query'}"
                )

    def _at_child_subquery(self) -> bool:
        t, nxt = self.peek(), self.peek(1)
        return bool(
            t
            and t.kind == "punct"
            and t.text == "("
            and nxt
            and nxt.kind == "kw"
            and nxt.text == "select"
        )

    def parse_child_subquery(self) -> _SelectItem:
        """``(SELECT fields FROM ChildRel [WHERE][ORDER BY][LIMIT])``.

        Salesforce semantics: one nested list of child records per
        parent row, named after the child relationship (or an alias).
        Dotted paths traverse from the CHILD object (bound in
        ``_attach_child_list``); aggregates inside the child select
        are not supported (SOQL itself forbids them there).
        """
        self.expect("punct", "(")
        self.expect("kw", "select")
        fields = [self.expect("ident").text]
        while self.accept("punct", ","):
            fields.append(self.expect("ident").text)
        self.expect("kw", "from")
        rel = self.expect("ident").text
        where_col = self.parse_bool_expr() if self.accept("kw", "where") else None
        order: list[tuple[str, bool]] = []
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            order.append(self._child_order_item())
            while self.accept("punct", ","):
                order.append(self._child_order_item())
        limit = None
        if self.accept("kw", "limit"):
            limit = int(self.expect("number").text)
        self.expect("punct", ")")
        alias = self.accept("ident")
        name = alias.text if alias else rel.lower()
        return _SelectItem(
            F.col(name), name, is_agg=False, src=None,
            child=_ChildQuery(fields, rel, where_col, order, limit),
        )

    def _child_order_item(self) -> tuple[str, bool]:
        field = self.expect("ident").text
        desc = bool(self.accept("kw", "desc"))
        if not desc:
            self.accept("kw", "asc")
        return field, desc

    def _at_aggregate(self) -> bool:
        t, nxt = self.peek(), self.peek(1)
        return bool(
            t
            and t.kind == "ident"
            and t.text.lower() in _AGG_FNS
            and nxt
            and nxt.kind == "punct"
            and nxt.text == "("
        )

    def parse_aggregate(self) -> tuple[Column, str]:
        fn = self.next().text.lower()
        self.expect("punct", "(")
        if fn == "count" and self.accept("punct", ")"):
            return F.count(F.lit(1)), "expr0"  # SOQL COUNT(): row count
        field = self.expect("ident").text
        self.expect("punct", ")")
        default = f"{fn}_{field.replace('.', '_')}".lower()
        if fn == "count":
            return F.count(field), default  # COUNT(field): non-null count
        if fn == "count_distinct":
            return F.count_distinct(field), default
        if fn == "grouping":
            # SOQL GROUPING(f): 1 on the subtotal rows ROLLUP/CUBE
            # generate for f, else 0 (int for engine portability)
            return F.grouping(field).cast("int"), default
        return getattr(F, fn)(field), default

    # -- boolean expressions ----------------------------------------------

    def parse_bool_expr(self) -> Column:
        # A lifted IN-subquery placeholder is only sound as an AND-ed
        # conjunct; under OR or NOT its True placeholder would change
        # the predicate's meaning — reject there.
        n0 = len(self.semi_joins)
        left = self.parse_bool_term()
        while self.accept("kw", "or"):
            left = left | self.parse_bool_term()
            if len(self.semi_joins) != n0:
                raise SoqlError(
                    "IN (SELECT ...) is only supported as a top-level AND-ed predicate"
                )
        return left

    def parse_bool_term(self) -> Column:
        left = self.parse_bool_factor()
        while self.accept("kw", "and"):
            left = left & self.parse_bool_factor()
        return left

    def parse_bool_factor(self) -> Column:
        if self.accept("kw", "not"):
            n0 = len(self.semi_joins)
            inner = self.parse_bool_factor()
            if len(self.semi_joins) != n0:
                raise SoqlError(
                    "IN (SELECT ...) is only supported as a top-level AND-ed predicate"
                )
            return ~inner
        if self.accept("punct", "("):
            inner = self.parse_bool_expr()
            self.expect("punct", ")")
            return inner
        return self.parse_predicate()

    def _predicate_lhs(self) -> Column:
        if self._at_aggregate():
            if not self.in_having:
                raise SoqlError("aggregates are only allowed in HAVING")
            col, default = self.parse_aggregate()
            hidden = f"_having_{len(self.having_aggs)}_{default}"
            self.having_aggs.append(col.alias(hidden))
            self._last_lhs = None
            return F.col(hidden)
        t = self.expect("ident")
        self._last_lhs = t.text
        return F.col(t.text)

    def parse_predicate(self) -> Column:
        lhs = self._predicate_lhs()
        if self.accept("kw", "like"):
            return lhs.like(self._literal_text(self.expect("string")))
        inc = self.accept("kw", "includes")
        exc = None if inc else self.accept("kw", "excludes")
        if inc or exc:
            self.expect("punct", "(")
            values = [self._literal_text(self.expect("string"))]
            while self.accept("punct", ","):
                values.append(self._literal_text(self.expect("string")))
            self.expect("punct", ")")
            cond = self._includes(lhs, values)
            return ~cond if exc else cond
        negate = bool(self.accept("kw", "not"))
        if self.accept("kw", "in"):
            self.expect("punct", "(")
            if self.peek() and self.peek().kind == "kw" and self.peek().text == "select":
                return self._parse_in_subquery(negate)
            vals = [self.parse_literal()]
            while self.accept("punct", ","):
                vals.append(self.parse_literal())
            self.expect("punct", ")")
            cond = lhs.isin(vals)
            return ~cond if negate else cond
        if negate:
            raise SoqlError("NOT must be followed by IN here")
        op = self.expect("punct").text
        rhs = self.parse_rhs()
        if isinstance(rhs, tuple) and rhs[0] == "range":
            # Salesforce date-literal range semantics: the literal is a
            # half-open [start, end) span of days/months/years.
            _, start, end = rhs
            if op == "=":
                return (lhs >= start) & (lhs < end)
            if op in ("!=", "<>"):
                return (lhs < start) | (lhs >= end)
            if op == "<":
                return lhs < start
            if op == "<=":
                return lhs < end
            if op == ">":
                return lhs >= end
            if op == ">=":
                return lhs >= start
            raise SoqlError(f"operator {op} not valid with a date literal")
        if rhs is None:  # null literal
            if op == "=":
                return lhs.isNull()
            if op in ("!=", "<>"):
                return lhs.isNotNull()
            raise SoqlError(f"operator {op} not valid with null")
        ops = {
            "=": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            "<>": lambda a, b: a != b,
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
        }
        if op not in ops:
            raise SoqlError(f"unknown operator {op!r}")
        return ops[op](lhs, rhs)

    def _parse_in_subquery(self, negate: bool) -> Column:
        """``field [NOT] IN (SELECT f FROM Object [WHERE ...])`` — the
        SOQL semi-join subquery form. A subquery is a *plan*, not a
        Column, so the predicate is lifted into ``self.semi_joins``
        (compiled to a LeftSemi/LeftAnti join) and replaced by a True
        placeholder in the boolean tree — sound only for top-level
        conjuncts, which parse_bool_expr/factor enforce. NOT IN
        compiles to an anti join (Salesforce semantics; NOT the
        SQL-null-poisoned NOT IN — the oracle uses NOT EXISTS).
        """
        if self.in_having:
            raise SoqlError("IN (SELECT ...) is not supported in HAVING")
        if self._last_lhs is None:
            raise SoqlError("IN (SELECT ...) requires a plain field on the left")
        lhs_field = self._last_lhs
        self.expect("kw", "select")
        sub_field = self.expect("ident").text
        self.expect("kw", "from")
        sub_obj = self.expect("ident").text
        sub_where = None
        if self.accept("kw", "where"):
            n0 = len(self.semi_joins)
            sub_where = self.parse_bool_expr()
            if len(self.semi_joins) != n0:
                raise SoqlError("nested IN (SELECT ...) is not supported")
        self.expect("punct", ")")
        self.semi_joins.append(
            {
                "lhs": lhs_field,
                "negate": negate,
                "obj": sub_obj,
                "field": sub_field,
                "where": sub_where,
            }
        )
        return F.lit(True)

    def _includes(self, lhs: Column, values: list[str]) -> Column:
        """Multipicklist membership, on ``array<string>`` (post-ingest)
        or raw ``;``-joined wire strings (SURVEY §1.2 MultiPicklist)."""
        # column name via its alias-free string form, e.g. "Tags"
        name = str(lhs).replace("Column<'", "").replace("'>", "")
        is_array = self.df is not None and any(
            f.name == name and isinstance(f.dataType, ArrayType)
            for f in self.df.schema.fields
        )
        arr = lhs if is_array else F.split(lhs, ";")
        out = F.array_contains(arr, values[0])
        for v in values[1:]:
            out = out | F.array_contains(arr, v)
        return out

    # -- literals ----------------------------------------------------------

    _DATE_LITERALS = ("TODAY", "YESTERDAY", "THIS_MONTH", "LAST_MONTH", "THIS_YEAR")

    def parse_rhs(self):
        """Literal, or a ('range', start, end) half-open day span for
        SOQL date literals (per the Salesforce date-literal table:
        LAST_N_DAYS includes today; NEXT_N_DAYS starts tomorrow)."""
        cd = F.current_date()
        t = self.peek()
        if t and t.kind == "datelit":
            self.next()
            kind, n = t.text.split(":")
            days = int(n)
            if kind == "LAST_N_DAYS":
                return ("range", F.date_sub(cd, days), F.date_add(cd, 1))
            return ("range", F.date_add(cd, 1), F.date_add(cd, days + 1))
        if t and t.kind == "ident" and t.text.upper() in self._DATE_LITERALS:
            self.next()
            up = t.text.upper()
            if up == "TODAY":
                return ("range", cd, F.date_add(cd, 1))
            if up == "YESTERDAY":
                return ("range", F.date_sub(cd, 1), cd)
            if up == "THIS_MONTH":
                start = F.trunc(cd, "month")
                return ("range", start, F.add_months(start, 1))
            if up == "LAST_MONTH":
                start = F.add_months(F.trunc(cd, "month"), -1)
                return ("range", start, F.trunc(cd, "month"))
            start = F.trunc(cd, "year")
            return ("range", start, F.add_months(start, 12))
        return self.parse_literal()

    def parse_literal(self):
        t = self.next()
        if t.kind == "string":
            return self._literal_text(t)
        if t.kind == "number":
            return float(t.text) if "." in t.text else int(t.text)
        if t.kind == "kw" and t.text in ("true", "false"):
            return t.text == "true"
        if t.kind == "kw" and t.text == "null":
            return None
        raise SoqlError(f"expected literal at position {t.pos}, got {t.text!r}")

    @staticmethod
    def _literal_text(t: Tok) -> str:
        return t.text[1:-1].replace("\\'", "'").replace("\\\\", "\\")

    # -- order by ----------------------------------------------------------

    def parse_order_item(self) -> Column:
        # dotted paths must be selected (they order by the flat output
        # column); plain fields order by the source column directly
        txt = self.expect("ident").text
        col = F.col(_norm(txt))
        desc = bool(self.accept("kw", "desc"))
        if not desc:
            self.accept("kw", "asc")
        nulls = None
        if self.accept("kw", "nulls"):
            nulls = "first" if self.accept("kw", "first") else "last"
            if nulls == "last":
                self.expect("kw", "last")
        if desc:
            return col.desc_nulls_first() if nulls == "first" else col.desc_nulls_last() if nulls == "last" else col.desc_nulls_first()
        return col.asc_nulls_last() if nulls == "last" else col.asc_nulls_first()


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------


def soql_to_df(
    soql: str,
    resolve,
    relationships: dict | None = None,
    child_relationships: dict | None = None,
    polymorphic: dict | None = None,
) -> DataFrame:
    """Compile a SOQL string against ``resolve(object_name) -> DataFrame``.

    ``polymorphic`` declares TYPEOF-addressable relationships:
    ``rel_name -> {"type_col": <discriminator column on the base
    object, holding the target object name per row>, "fk_col": <FK
    column on the base object>, "targets": {object_name: pk_col}}``.
    Each TYPEOF WHEN branch compiles to one type-gated left join; see
    ``_Parser.parse_typeof``.

    ``relationships`` maps a relationship name (the prefix of dotted
    ``Rel.Field`` paths) to ``(parent_object, fk_col, parent_pk_col)``
    — the local analog of the Salesforce ``Reference`` field's
    ``relationship_name`` (SURVEY §1.2; the reference declares these
    as FKs in DDL, ``sql-builder/src/main.rs:89``). Each relationship
    used by the query becomes ONE left join, added only when
    referenced — unused relationships cost nothing.

    ``child_relationships`` maps a CHILD relationship name (the FROM
    target of a nested ``(SELECT ... FROM Rel)`` select item) to
    ``(child_object, fk_col_on_child, parent_pk_col)``. Each child
    subquery compiles to ONE aggregation of the child object —
    ``groupBy(fk).agg(sort_array(collect_list(struct(...))))`` — left
    joined on the parent PK: per-parent nested record lists (the
    Salesforce wire shape for parent-to-child queries) in exactly one
    extra shuffle per child relationship, with no per-parent
    execution. Parents with no (matching) children carry NULL, like
    Salesforce. The child list is always sorted (by the child ORDER
    BY, else by the selected fields) so results are deterministic on
    any engine.

    The output is an ordinary DataFrame: Catalyst sees the whole
    declarative plan, so filter pushdown, column pruning, and
    broadcast selection for the parent joins come for free.
    """
    toks = _tokenize(soql)
    if not toks or not (toks[0].kind == "kw" and toks[0].text == "select"):
        raise SoqlError("query must start with SELECT")

    # locate depth-0 FROM to bind the source before parsing SELECT items
    depth, from_idx = 0, None
    for j, t in enumerate(toks):
        if t.kind == "punct" and t.text == "(":
            depth += 1
        elif t.kind == "punct" and t.text == ")":
            depth -= 1
        elif t.kind == "kw" and t.text == "from" and depth == 0:
            from_idx = j
            break
    if from_idx is None or from_idx + 1 >= len(toks) or toks[from_idx + 1].kind != "ident":
        raise SoqlError("missing or malformed FROM clause")
    df = resolve(toks[from_idx + 1].text)
    base_fields = list(df.columns)  # schema order, pre-join (FIELDS(ALL))
    base_cols = set(df.columns)

    # bind child-to-parent traversals on the BASE object. Dotted paths
    # inside child subqueries traverse from the CHILD object instead,
    # so their token spans (parenthesized ``(SELECT …)`` items in the
    # select list) are excluded here and bound in _attach_child_list.
    child_spans: set[int] = set()
    child_span_ranges: list[tuple[int, int]] = []  # select-list order
    depth, open_at = 0, None
    for j, t in enumerate(toks[:from_idx]):
        if t.kind == "punct" and t.text == "(":
            nxt = toks[j + 1] if j + 1 < len(toks) else None
            if depth == 0 and nxt and nxt.kind == "kw" and nxt.text == "select":
                open_at = j
            depth += 1
        elif t.kind == "punct" and t.text == ")":
            depth -= 1
            if depth == 0 and open_at is not None:
                child_spans.update(range(open_at, j + 1))
                child_span_ranges.append((open_at, j))
                open_at = None
    dotted = [
        t
        for j, t in enumerate(toks)
        if j not in child_spans
        and t.kind == "ident"
        and "." in t.text
        and t.text.lower() not in _KEYWORDS
    ]
    base_alias = "_soql_base"
    df, rewrite = _bind_relationship_chains(
        df, [t.text for t in dotted], relationships, resolve, base_alias
    )
    # rewrite column refs to their flat chain alias so the parser's
    # F.col(text) resolves against the joined frame (single-hop
    # rewrites are identity: the join alias IS the relationship name)
    for t in dotted:
        t.text = rewrite[t.text]
    used_rels = bool(rewrite)  # truthiness consumed below

    # child-span dotted paths traverse from the CHILD object: record
    # each span's original texts (the joins are applied per-child in
    # _attach_child_list, which needs the chain segments) and rewrite
    # the tokens to flat-alias form NOW, before the parser builds
    # Columns from them. Spans and parsed child items share select-
    # list order, so they zip below.
    child_dotted: list[list[str]] = []
    for lo, hi in child_span_ranges:
        texts: list[str] = []
        for t in toks[lo : hi + 1]:
            if t.kind == "ident" and "." in t.text and t.text.lower() not in _KEYWORDS:
                texts.append(t.text)
                t.text = _flatten_dotted(t.text)
        child_dotted.append(texts)

    p = _Parser(toks, df, polymorphic, base_fields=base_fields)
    p.expect("kw", "select")
    select_items = p.parse_select_list()
    if p.i != from_idx:
        raise SoqlError(f"unparsed tokens in select list near {toks[p.i].text!r}")
    p.i = from_idx + 2

    where_col = p.parse_bool_expr() if p.accept("kw", "where") else None

    group_texts: list[str] = []
    group_exprs: dict[str, Column] = {}  # canonical text -> unaliased Column
    group_mode = "plain"  # "plain" | "rollup" | "cube" (SOQL supports all three)

    def _group_ref() -> None:
        if p._at_date_fn():
            col, text = p.parse_date_fn()
        else:
            text = p.expect("ident").text
            col = F.col(text)
        group_texts.append(text)
        group_exprs[text] = col

    if p.accept("kw", "group"):
        p.expect("kw", "by")
        nxt = p.peek()
        if (
            nxt
            and nxt.kind == "ident"
            and nxt.text.lower() in ("rollup", "cube")
            and p.peek(1)
            and p.peek(1).text == "("
        ):
            group_mode = nxt.text.lower()
            p.next()
            p.expect("punct", "(")
            _group_ref()
            while p.accept("punct", ","):
                _group_ref()
            p.expect("punct", ")")
        else:
            _group_ref()
            while p.accept("punct", ","):
                _group_ref()
    rollup = group_mode != "plain"  # truthiness consumed below

    having_col = None
    if p.accept("kw", "having"):
        p.in_having = True
        having_col = p.parse_bool_expr()
        p.in_having = False

    order_cols: list[Column] = []
    if p.accept("kw", "order"):
        p.expect("kw", "by")
        order_cols.append(p.parse_order_item())
        while p.accept("punct", ","):
            order_cols.append(p.parse_order_item())

    limit_n = offset_n = None
    if p.accept("kw", "limit"):
        limit_n = int(p.expect("number").text)
    if p.accept("kw", "offset"):
        offset_n = int(p.expect("number").text)
    if p.peek() is not None:
        raise SoqlError(f"unparsed trailing tokens near {p.peek().text!r}")

    # -- child subqueries: one aggregation + left join per child rel -------
    child_items = [it for it in select_items if it.child is not None]
    if child_items:
        if group_texts or any(it.is_agg for it in select_items) or p.having_aggs:
            raise SoqlError(
                "child subqueries cannot be combined with GROUP BY or aggregates"
            )
        for it, texts in zip(child_items, child_dotted):
            df = _attach_child_list(
                df, it, resolve, child_relationships, relationships, texts,
                base_cols, base_alias if used_rels else None,
            )

    # -- TYPEOF branches: one type-gated left join per (rel, object) -------
    if p.typeof_joins:
        if group_texts or any(it.is_agg for it in select_items) or p.having_aggs:
            # mirrors Salesforce: TYPEOF is invalid with GROUP BY/aggregates
            raise SoqlError("TYPEOF cannot be combined with GROUP BY or aggregates")
        for rel, obj in dict.fromkeys(p.typeof_joins):  # dedup, keep order
            spec = polymorphic[rel]
            pk = spec["targets"][obj]
            alias = f"__typeof_{rel}_{obj}"
            parent = resolve(obj).alias(alias)
            df = df.join(
                parent,
                (F.col(spec["fk_col"]) == F.col(f"{alias}.{pk}"))
                & (F.col(spec["type_col"]) == F.lit(obj)),
                "left",
            )

    # -- assemble ----------------------------------------------------------
    has_agg = any(it.is_agg for it in select_items) or bool(p.having_aggs)
    out = df
    if where_col is not None:
        out = out.filter(where_col)
    # lifted IN (SELECT ...) conjuncts → semi/anti joins, pre-agg;
    # the subquery side projects only its key column (pruned scan)
    for sj in p.semi_joins:
        sub = resolve(sj["obj"])
        if sj["where"] is not None:
            sub = sub.filter(sj["where"])
        sub = sub.select(F.col(sj["field"]).alias("__in_key"))
        how = "left_anti" if sj["negate"] else "left_semi"
        out = out.join(sub, F.col(sj["lhs"]) == F.col("__in_key"), how)
    # grouped outputs take the SELECT alias of the matching field path
    alias_by_src = {it.src: it.name for it in select_items if it.src}

    def _gname(t: str) -> str:
        # flat default name for a group ref ("calendar_year(x)" → "calendar_year_x")
        return t.replace("(", "_").replace(")", "").replace(".", "_").lower() if "(" in t else _norm(t)

    group_cols = [
        group_exprs[t].alias(alias_by_src.get(t, _gname(t))) for t in group_texts
    ]
    if group_cols or has_agg:
        aggs = [it.col for it in select_items if it.is_agg] + p.having_aggs
        if rollup and not aggs:
            raise SoqlError(f"GROUP BY {group_mode.upper()} requires at least one aggregate")
        if group_cols and aggs:
            if group_mode != "plain":
                # ROLLUP/CUBE group bare columns RAW — GROUPING(f) must
                # reference the grouping expression exactly, and an
                # alias wrapper breaks Spark's matching
                # ([GROUPING_COLUMN_MISMATCH]); select aliases re-apply
                # by rename after the aggregate. Date-fn refs alias
                # inline (GROUPING() on them is not supported).
                raw = [
                    group_exprs[t].alias(alias_by_src.get(t, _gname(t)))
                    if "(" in t
                    else F.col(t)
                    for t in group_texts
                ]
                grouped = out.rollup(*raw) if group_mode == "rollup" else out.cube(*raw)
                out = grouped.agg(*aggs)
                for t in group_texts:
                    want = alias_by_src.get(t, _gname(t))
                    if "(" not in t and t.split(".")[-1] != want:
                        out = out.withColumnRenamed(t.split(".")[-1], want)
            else:
                out = out.groupBy(*group_cols).agg(*aggs)
        elif group_cols:
            out = out.select(*group_cols).distinct()  # GROUP BY, no aggregates
        else:
            out = out.agg(*aggs)
        if having_col is not None:
            out = out.filter(having_col)
        out = out.select(*[it.name for it in select_items])  # drop hidden aggs
    else:
        out = out.select(*[it.col for it in select_items])
    if order_cols:
        out = out.orderBy(*order_cols)
    if offset_n:
        out = out.offset(offset_n)
    if limit_n is not None:
        out = out.limit(limit_n)
    return out


def _flatten_dotted(text: str) -> str:
    """Rewrite a multi-hop dotted path to its flat chain alias
    (``customer.nation.n_name`` → ``customer_nation.n_name``). One-hop
    paths are identity: the join alias IS the relationship name."""
    segs = text.split(".")
    if len(segs) <= 2:
        return text
    return "_".join(segs[:-1]) + "." + segs[-1]


def _bind_relationship_chains(
    df: DataFrame,
    texts: list[str],
    relationships: dict | None,
    resolve,
    base_alias: str,
) -> tuple[DataFrame, dict[str, str]]:
    """Join every relationship-chain prefix referenced by the dotted
    paths in ``texts`` onto ``df`` — exactly one left join per
    DISTINCT chain, so ten references to ``customer.c_name`` cost one
    join and unused relationships cost nothing.

    Multi-hop chains (``customer.nation.n_name``) join one parent per
    hop, aliased by the "_"-joined chain ("customer",
    "customer_nation", …) so qualified column refs resolve naturally
    and two different paths reaching the same object stay distinct
    joins. Each hop's FK resolves against the PREVIOUS hop's object
    (hop 1 against the aliased base — a parent carrying a same-named
    column can never capture the reference); a missing FK is a
    SoqlError with context, not an escaped AnalysisException.

    Returns ``(joined_df, rewrite)`` where ``rewrite`` maps every
    input text to the flat-alias form (``_flatten_dotted``) the parser
    should build ``F.col`` from. Empty ``texts`` returns ``df``
    unchanged and an empty map.

    Scale: parents here are dimension-sized (the Salesforce lookup
    targets, ref ``sql-builder/src/main.rs:89``), so Catalyst/AQE
    picks broadcast-hash for these joins — no fact-side shuffle.
    """
    chains: set[tuple[str, ...]] = set()
    for text in texts:
        segs = text.split(".")
        for i in range(1, len(segs)):
            chains.add(tuple(segs[:i]))
    rewrite = {text: _flatten_dotted(text) for text in texts}
    if not chains:
        return df, rewrite
    frame_cols: dict[tuple[str, ...], set] = {(): set(df.columns)}
    df = df.alias(base_alias)
    for chain in sorted(chains, key=lambda c: (len(c), c)):
        rel = chain[-1]
        if not relationships or rel not in relationships:
            raise SoqlError(
                f"unknown relationship {rel!r}; declare it in `relationships`"
            )
        parent_obj, fk_col, pk_col = relationships[rel]
        hop_cols = frame_cols[chain[:-1]]
        if fk_col not in hop_cols:
            raise SoqlError(
                f"relationship path {'.'.join(chain)!r}: FK column {fk_col!r} not "
                f"found on the previous hop's object (columns: {sorted(hop_cols)})"
            )
        alias = "_".join(chain)
        parent_alias = "_".join(chain[:-1]) if len(chain) > 1 else base_alias
        parent = resolve(parent_obj).alias(alias)
        frame_cols[chain] = set(parent.columns)
        df = df.join(
            parent,
            F.col(f"{parent_alias}.{fk_col}") == F.col(f"{alias}.{pk_col}"),
            "left",
        )
    return df, rewrite


def _attach_child_list(
    df: DataFrame,
    item: _SelectItem,
    resolve,
    child_relationships: dict | None,
    relationships: dict | None,
    dotted_texts: list[str],
    base_cols: set,
    base_alias: str | None,
) -> DataFrame:
    """Left-join one child subquery's nested list onto the parent.

    Shape: child → [bind dotted chains] → [filter] → groupBy(fk) →
    sort_array(collect_list(struct)) → [slice for LIMIT] → reproject
    to the selected fields → LEFT join on parent PK. One shuffle per
    child relationship; the parent WHERE pushes below the left join
    (Catalyst), so filtered parents never pay for children.

    ``dotted_texts`` are the span's ORIGINAL dotted paths (tokens were
    already rewritten to flat-alias form in ``soql_to_df``): they
    traverse from the CHILD object, so the chain joins bind here,
    against the child frame, before its aggregation. Output struct
    fields take the ``_norm`` name (``customer_nation_n_name``) —
    same flattening convention as top-level dotted selects.
    """
    ch = item.child
    if not child_relationships or ch.rel not in child_relationships:
        raise SoqlError(
            f"unknown child relationship {ch.rel!r}; declare it in `child_relationships`"
        )
    child_obj, fk_col, parent_pk = child_relationships[ch.rel]
    if parent_pk not in base_cols:
        raise SoqlError(
            f"child relationship {ch.rel!r}: parent PK {parent_pk!r} not found on "
            f"the queried object (columns: {sorted(base_cols)})"
        )
    cdf = resolve(child_obj)
    plain = [c for c in [fk_col, *ch.fields, *[f for f, _ in ch.order]] if "." not in c]
    missing = [c for c in plain if c not in cdf.columns]
    if missing:
        raise SoqlError(
            f"child relationship {ch.rel!r}: columns {missing} not found on "
            f"{child_obj!r} (columns: {cdf.columns})"
        )
    child_alias = f"__csub_{item.name}"
    bound = bool(dotted_texts)
    cdf, _ = _bind_relationship_chains(
        cdf, dotted_texts, relationships, resolve, child_alias
    )

    def cref(name: str) -> Column:
        # after binding, qualify the child's own columns so a parent
        # object carrying a same-named column can't capture them
        if bound and "." not in name:
            return F.col(f"{child_alias}.{name}")
        return F.col(name)

    if ch.where is not None:
        cdf = cdf.filter(ch.where)
    directions = {d for _, d in ch.order}
    if len(directions) > 1:
        raise SoqlError("mixed ASC/DESC in a child subquery ORDER BY is not supported")
    descending = bool(ch.order and ch.order[0][1])
    # sort keys lead the struct so lexicographic sort_array honors the
    # ORDER BY, with the remaining selected fields as a deterministic
    # tiebreak; no ORDER BY sorts by the selected fields themselves.
    sort_keys = [f for f, _ in ch.order]
    struct_fields = sort_keys + [f for f in ch.fields if f not in sort_keys]
    arr = F.sort_array(
        F.collect_list(F.struct(*[cref(f).alias(_norm(f)) for f in struct_fields])),
        asc=not descending,
    )
    key = f"__ckey_{item.name}"
    cagg = cdf.groupBy(cref(fk_col).alias(key)).agg(arr.alias("__carr"))
    carr = F.col("__carr")
    if ch.limit is not None:
        carr = F.slice(carr, 1, ch.limit)
    # reproject each element to exactly the selected fields, in order
    carr = F.transform(
        carr, lambda x: F.struct(*[x[_norm(f)].alias(_norm(f)) for f in ch.fields])
    )
    cagg = cagg.select(key, carr.alias(item.name))
    pk_ref = F.col(f"{base_alias}.{parent_pk}") if base_alias else F.col(parent_pk)
    return df.join(cagg, pk_ref == F.col(key), "left").drop(key)
