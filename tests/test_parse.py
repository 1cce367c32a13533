"""Parser unit tests — the FIXTURES.md §2.3 redo literal corpus plus the
reference's documented edge cases (cleanString, Issue-71 unescaping,
IS NULL → = NULL, TIMESTAMP literals, update carry-forward)."""

from __future__ import annotations

import json

from kafka_connect_logminer2_spark.operators.parse import (
    build_images,
    clean_string,
    parse_dml,
)


def test_insert_basic():
    kind, data, before = parse_dml(
        'insert into "TPCH"."CUSTOMER"("C_CUSTKEY","C_NAME") values (1,\'Alice\')'
    )
    assert kind == "insert"
    assert data == {"C_CUSTKEY": "1", "C_NAME": "Alice"}
    assert before == {}


def test_insert_escaped_quotes_unescaped_mode():
    kind, data, _ = parse_dml(
        'insert into "T"."X"("A") values (\'it\'\'s\')', map_unescaped=True
    )
    assert data["A"] == "it's"


def test_insert_escaped_quotes_escaped_mode():
    # reference default (map.unescaped.strings=false) keeps doubled quotes
    kind, data, _ = parse_dml(
        'insert into "T"."X"("A") values (\'it\'\'s\')', map_unescaped=False
    )
    assert data["A"] == "it''s"


def test_insert_null_literal():
    _, data, _ = parse_dml('insert into "T"."X"("A","B") values (NULL,2)')
    assert data == {"A": "NULL", "B": "2"}
    dj, bj = build_images("INSERT", 'insert into "T"."X"("A","B") values (NULL,2)')
    assert json.loads(dj) == {"A": None, "B": "2"}
    assert bj is None


def test_update_where_is_null():
    _, data, before = parse_dml(
        'update "T"."X" set "A" = 5 where "B" = 1 and "C" IS NULL'
    )
    assert data == {"A": "5"}
    assert before == {"B": "1", "C": "NULL"}


def test_update_carry_forward():
    # after-image = WHERE columns with SET values carried over
    # (OracleSourceConnectorUtils2.java:389-399)
    dj, bj = build_images(
        "UPDATE",
        'update "T"."X" set "A" = 9 where "A" = 1 and "B" = \'keep\'',
    )
    assert json.loads(dj) == {"A": "9", "B": "keep"}
    assert json.loads(bj) == {"A": "1", "B": "keep"}


def test_delete_before_image():
    dj, bj = build_images(
        "DELETE", 'delete from "T"."X" where "A" = 1 and "B" = \'x\''
    )
    assert dj is None
    assert json.loads(bj) == {"A": "1", "B": "x"}


def test_timestamp_literal():
    _, _, before = parse_dml(
        'delete from "T"."X" where "TS" = TIMESTAMP \' 2026-08-13 10:00:00\''
    )
    assert before["TS"] == "2026-08-13 10:00:00"


def test_clean_string():
    assert clean_string("TIMESTAMP ' 2026-01-01 00:00:00'") == "2026-01-01 00:00:00"
    assert clean_string("'quoted'") == "quoted"
    assert clean_string('"C_NAME"') == "C_NAME"
    assert clean_string("  x  ") == "x"


def test_string_containing_separators():
    _, data, before = parse_dml(
        "update \"O\".\"T\" set \"A\" = 'x, and ''y'' = 3' where \"A\" = 'w' and \"B\" = 2"
    )
    assert data["A"] == "x, and 'y' = 3"
    assert before == {"A": "w", "B": "2"}


def test_where_skips_non_equality():
    # EqualsTo-only visitor parity: >, <, != conjuncts are ignored
    _, _, before = parse_dml('delete from "T"."X" where "A" = 1 and "B" > 5')
    assert before == {"A": "1"}


def test_multiline_statement():
    _, data, _ = parse_dml(
        'insert into "T"."X"("A",\n"B") values (1,\n2)'
    )
    assert data == {"A": "1", "B": "2"}


def test_malformed_returns_other():
    kind, data, before = parse_dml("insert into garbage ((((")
    assert kind == "OTHER"


def test_ddl_images_null():
    assert build_images("DDL", "create table foo (x int)") == (None, None)


# ---------------------------------------------------------------------------
# property: random values survive the generate → parse roundtrip
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ident = st.from_regex(r"[A-Z][A-Z0-9_]{0,10}", fullmatch=True)
_value = st.one_of(
    st.integers(-10**12, 10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False, width=32).map(lambda f: repr(float(f))),
    st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
        max_size=20,
    ),
    st.none(),
)


def _fmt(v):
    if v is None:
        return "NULL"
    try:
        float(v)
        return v
    except (TypeError, ValueError):
        return "'" + v.replace("'", "''") + "'"


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(_ident, _value, min_size=1, max_size=8))
def test_insert_roundtrip_property(cols):
    names = list(cols)
    sql = (
        'insert into "O"."T"('
        + ",".join(f'"{n}"' for n in names)
        + ") values ("
        + ",".join(_fmt(cols[n]) for n in names)
        + ")"
    )
    kind, data, before = parse_dml(sql)
    assert kind == "insert"
    assert before == {}
    for n in names:
        expected = cols[n]
        got = data[n]
        if expected is None:
            assert got == "NULL"  # literal NULL string; nulled at coercion
        else:
            # cleanString trims outer whitespace (reference :472) and the
            # parser un-escapes '' → ' (map.unescaped.strings default)
            assert got == str(expected).strip()


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(_ident, _value, min_size=1, max_size=5),
       st.dictionaries(_ident, _value, min_size=1, max_size=5))
def test_update_roundtrip_property(set_cols, where_cols):
    sql = (
        'update "O"."T" set '
        + ", ".join(f'"{n}" = {_fmt(v)}' for n, v in set_cols.items())
        + " where "
        + " and ".join(
            f'"{n}" IS NULL' if v is None else f'"{n}" = {_fmt(v)}'
            for n, v in where_cols.items()
        )
    )
    kind, data, before = parse_dml(sql)
    assert kind == "update"
    assert set(data) == set(set_cols)
    assert set(before) == set(where_cols)
