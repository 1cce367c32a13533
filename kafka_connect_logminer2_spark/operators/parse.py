"""Redo-SQL DML parser — the engine's core compute (reference operator A10/A11).

Parses LogMiner-shaped ``SQL_REDO`` text (INSERT / UPDATE / DELETE) into
column→value string maps for the after-image (``data``) and before-image
(``before``), replicating the reference's JSQLParser-based semantics
(OracleSourceConnectorUtils2.java:256-358) including:

* ``IS NULL`` → ``= NULL`` preprocessing (:268)
* ``cleanString`` literal cleanup (:467-472): strip ``TIMESTAMP `` prefix,
  strip outer single/double quotes, map ``IS NULL``→``= NULL``, trim
* Issue-#71 unescaped-strings mode (:286-292, :309-315, :324-329, :342-347):
  ``''`` inside string literals un-doubled; in UPDATE SET position the
  unescaped value bypasses cleanString (reference :313 has no cleanString call)
* UPDATE before-image = WHERE equality conjuncts; after-image built *only*
  from before-image columns with SET values carried over
  (createDataSchema :389-399 — a reference quirk we mirror: SET-only columns
  absent from WHERE never reach the after-image; LogMiner canonical redo
  always repeats SET columns in WHERE, so this is lossless in practice)
* INSERT → ``before`` is null (:409-411); DELETE → ``data`` is null (:413-415)
* WHERE parsing keeps only top-level ``col = value`` equality conjuncts, like
  the reference's EqualsTo-only ExpressionVisitorAdapter (:319-333, :337-351)

The engine runs this per-row logic inside an Arrow-batched pandas UDF
(``parse_redo_udf``) so batches cross the JVM↔Python boundary vectorized;
the maps travel as JSON strings through the fixed-schema streaming core and
are typed per-table at materialization (schema_registry.py) — the key
adaptation that makes per-table dynamic schemas work on Spark (SURVEY §1.4).
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

NULL_FIELD = "NULL"  # OracleConnectorSchema.java:37 — literal NULL marker

_STMT_RE = re.compile(r"^\s*(insert|update|delete)\b", re.IGNORECASE)


def clean_string(s: str) -> str:
    """Replicates cleanString (OracleSourceConnectorUtils2.java:467-472)."""
    if s.startswith("TIMESTAMP"):
        s = s.replace("TIMESTAMP ", "")
    # len guard: a lone quote (e.g. the unescape of '''') must survive —
    # the reference's substring(1, len-1) would throw here and the record
    # would be skipped by its error tolerance; we keep the value instead
    if s.startswith("'") and s.endswith("'") and len(s) > 1:
        s = s[1:-1]
    if s.startswith('"') and s.endswith('"') and len(s) > 1:
        s = s[1:-1]
    return s.replace("IS NULL", "= NULL").strip()


def _unescape(s: str) -> str:
    """JSQLParser StringValue.getNotExcapedValue analog: un-double ''."""
    return s.replace("''", "'")


class _Scanner:
    """Minimal quote/paren-aware scanner over a SQL statement."""

    __slots__ = ("s", "i", "n")

    def __init__(self, s: str, i: int = 0):
        self.s = s
        self.i = i
        self.n = len(s)

    def skip_ws(self) -> None:
        while self.i < self.n and self.s[self.i] in " \t\r\n":
            self.i += 1

    def find_keyword(self, kw: str) -> int:
        """Index of keyword at depth 0 outside quotes, else -1."""
        s, n, m = self.s, self.n, len(kw)
        depth = 0
        i = self.i
        low = s.lower()
        kw = kw.lower()
        while i < n:
            c = s[i]
            if c == "'":
                i = _skip_string(s, i)
            elif c == '"':
                j = s.find('"', i + 1)
                i = n if j < 0 else j + 1
            elif c == "(":
                depth += 1
                i += 1
            elif c == ")":
                depth -= 1
                i += 1
            elif depth == 0 and low.startswith(kw, i) and _is_word_boundary(low, i, m):
                return i
            else:
                i += 1
        return -1


def _is_word_boundary(low: str, i: int, m: int) -> bool:
    before_ok = i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_")
    j = i + m
    after_ok = j >= len(low) or not (low[j].isalnum() or low[j] == "_")
    return before_ok and after_ok


def _skip_string(s: str, i: int) -> int:
    """i points at opening quote; return index past closing quote ('' escapes)."""
    n = len(s)
    i += 1
    while i < n:
        if s[i] == "'":
            if i + 1 < n and s[i + 1] == "'":
                i += 2
                continue
            return i + 1
        i += 1
    return n


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on a separator char (',') at depth 0 outside quotes."""
    parts: list[str] = []
    depth = 0
    i = last = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i = _skip_string(s, i)
            continue
        if c == '"':
            j = s.find('"', i + 1)
            i = n if j < 0 else j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[last:i])
            last = i + 1
        i += 1
    parts.append(s[last:])
    return parts


def _split_conjuncts(s: str) -> list[str]:
    """Split a WHERE clause on top-level ``and``/``or`` (keep conjuncts only)."""
    out: list[str] = []
    low = s.lower()
    n = len(s)
    depth = 0
    i = last = 0
    while i < n:
        c = s[i]
        if c == "'":
            i = _skip_string(s, i)
            continue
        if c == '"':
            j = s.find('"', i + 1)
            i = n if j < 0 else j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            for kw in ("and", "or"):
                if low.startswith(kw, i) and _is_word_boundary(low, i, len(kw)):
                    out.append(s[last:i])
                    last = i + len(kw)
                    i += len(kw)
                    break
            else:
                i += 1
                continue
            continue
        i += 1
    out.append(s[last:])
    return out


def _split_equality(s: str) -> tuple[str, str] | None:
    """Split ``col = value`` on the first depth-0 '=' outside quotes."""
    n = len(s)
    depth = 0
    i = 0
    while i < n:
        c = s[i]
        if c == "'":
            i = _skip_string(s, i)
            continue
        if c == '"':
            j = s.find('"', i + 1)
            i = n if j < 0 else j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "=" and depth == 0:
            # reject >=, <=, !=, <> forms
            if i > 0 and s[i - 1] in "<>!":
                return None
            return s[:i], s[i + 1 :]
        i += 1
    return None


def _is_string_literal(tok: str) -> bool:
    tok = tok.strip()
    return len(tok) >= 2 and tok.startswith("'") and tok.endswith("'")


def _value(tok: str, map_unescaped: bool, clean_unescaped: bool = True) -> str:
    """cleanString + Issue-71 override, replicating each call site's order."""
    tok = tok.strip()
    if map_unescaped and _is_string_literal(tok):
        inner = _unescape(tok[1:-1])
        return clean_string(inner) if clean_unescaped else inner
    return clean_string(tok)


def _parse_where(where: str, map_unescaped: bool) -> dict[str, str]:
    before: dict[str, str] = {}
    for conj in _split_conjuncts(where):
        conj = conj.strip()
        if not conj:
            continue
        eq = _split_equality(conj)
        if eq is None:
            continue  # non-equality predicates skipped, like EqualsTo-only visitor
        col, val = eq
        before[clean_string(col.strip())] = _value(val, map_unescaped)
    return before


def parse_dml(sql_redo: str, map_unescaped: bool = True) -> tuple[str, dict[str, str], dict[str, str]]:
    """Parse one redo DML statement.

    Returns ``(stmt_kind, data_map, before_map)`` of *string* values
    (``"NULL"`` marks SQL NULL, resolved at coercion time like the
    reference's NULL_FIELD check, OracleSourceConnectorUtils2.java:392).
    """
    sql = sql_redo.replace("IS NULL", "= NULL")  # :268, exact behavior
    m = _STMT_RE.match(sql)
    if not m:
        return ("OTHER", {}, {})
    kind = m.group(1).lower()
    data: dict[str, str] = {}
    before: dict[str, str] = {}

    if kind == "insert":
        sc = _Scanner(sql, m.end())
        vi = sc.find_keyword("values")
        if vi < 0:
            return ("OTHER", {}, {})
        head, tail = sql[: vi], sql[vi + len("values") :]
        cols_open = head.index("(")
        cols_close = head.rindex(")")
        cols = [clean_string(c.strip()) for c in _split_top_level(head[cols_open + 1 : cols_close], ",")]
        vals_open = tail.index("(")
        vals_close = tail.rindex(")")
        vals = _split_top_level(tail[vals_open + 1 : vals_close], ",")
        for c, v in zip(cols, vals):
            data[c] = _value(v, map_unescaped)
        return ("insert", data, {})

    if kind == "update":
        sc = _Scanner(sql, m.end())
        si = sc.find_keyword("set")
        if si < 0:
            return ("OTHER", {}, {})
        sc2 = _Scanner(sql, si + 3)
        wi = sc2.find_keyword("where")
        set_part = sql[si + 3 : wi if wi >= 0 else len(sql)]
        for assign in _split_top_level(set_part, ","):
            eq = _split_equality(assign.strip())
            if eq is None:
                continue
            col, val = eq
            # reference :313: unescaped SET strings bypass cleanString
            data[clean_string(col.strip())] = _value(val, map_unescaped, clean_unescaped=False)
        if wi >= 0:
            before = _parse_where(sql[wi + 5 :], map_unescaped)
        return ("update", data, before)

    # delete
    sc = _Scanner(sql, m.end())
    wi = sc.find_keyword("where")
    if wi >= 0:
        before = _parse_where(sql[wi + 5 :], map_unescaped)
    return ("delete", {}, before)


# Operation constants (OracleConnectorSchema.java:57-63)
OP_INSERT, OP_UPDATE, OP_DELETE, OP_DDL = "INSERT", "UPDATE", "DELETE", "DDL"
OP_COMMIT, OP_ROLLBACK, OP_START = "COMMIT", "ROLLBACK", "START"


def build_images(
    operation: str, sql_redo: str, map_unescaped: bool = True
) -> tuple[str | None, str | None]:
    """Full A10+A13-shape step: parse + assemble after/before images as JSON.

    Mirrors createDataSchema's image assembly
    (OracleSourceConnectorUtils2.java:386-415):
      UPDATE: before = WHERE map; data = {c: SET.get(c, before[c]) for c in before}
      INSERT: data = VALUES map; before = None
      DELETE: before = WHERE map; data = None
    ``"NULL"`` string values become JSON null here (NULL_FIELD check :392).
    """
    if operation == OP_DDL:
        return None, None
    kind, set_map, where_map = parse_dml(sql_redo, map_unescaped)
    def _nullify(d: dict[str, str]) -> dict[str, str | None]:
        return {k: (None if v == NULL_FIELD else v) for k, v in d.items()}

    if operation == OP_INSERT and kind == "insert":
        return json.dumps(_nullify(set_map)), None
    if operation == OP_UPDATE and kind == "update":
        before = _nullify(where_map)
        data = {c: (set_map[c] if c in set_map else where_map[c]) for c in where_map}
        return json.dumps(_nullify(data)), json.dumps(before)
    if operation == OP_DELETE and kind == "delete":
        return None, json.dumps(_nullify(where_map))
    return None, None


PARSED_SCHEMA = StructType(
    [
        StructField("data_json", StringType(), True),
        StructField("before_json", StringType(), True),
    ]
)


def make_parse_udf(map_unescaped: bool = True):
    """Arrow-batched pandas UDF: (operation, sql_redo) → struct(data_json, before_json).

    Row-at-a-time string parsing is unavoidable (like the reference's
    per-record JSQLParser call) but Arrow batching keeps transfer vectorized —
    the Spark analog of operator A10 staying off the driver and out of the
    row-at-a-time Python UDF slow path.
    """

    @F.pandas_udf(PARSED_SCHEMA)
    def parse_redo(operation: pd.Series, sql_redo: pd.Series) -> pd.DataFrame:
        out_data: list[str | None] = []
        out_before: list[str | None] = []
        for op, sql in zip(operation, sql_redo):
            if sql is None or op not in (OP_INSERT, OP_UPDATE, OP_DELETE):
                out_data.append(None)
                out_before.append(None)
                continue
            try:
                d, b = build_images(op, sql, map_unescaped)
            except Exception:
                d, b = None, None  # record-level tolerance (LogMinerThread2.java:225-228)
            out_data.append(d)
            out_before.append(b)
        return pd.DataFrame({"data_json": out_data, "before_json": out_before})

    return parse_redo
