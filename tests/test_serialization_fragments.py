"""Property tests for the cross-engine serialization fragments:

- fixed7_expr: int 1e-7 units -> decimal-degree string (X10 coords)
- _le_double_hex: integer-valued double -> little-endian IEEE-754 hex
  (X11 WKB oracle)

Both run in DuckDB only (fast, no Spark session) and are compared to
straight Python/struct formulations over adversarial ranges.
"""

import struct

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osmquadtree_rust_bindings_spark.driver_oracles import _le_double_hex
from osmquadtree_rust_bindings_spark.functions.sqlgen import fixed7_expr


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def py_fixed7(v: int) -> str:
    sign = "-" if v < 0 else ""
    a = abs(v)
    return f"{sign}{a // 10_000_000}.{a % 10_000_000:07d}"


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-1_800_000_000, 1_800_000_000),
                min_size=1, max_size=50))
def test_fixed7_matches_python(duck, vals):
    rows = ", ".join(f"({v})" for v in vals)
    got = [r[0] for r in duck.sql(
        f"SELECT {fixed7_expr('v')} FROM (VALUES {rows}) t(v)").fetchall()]
    assert got == [py_fixed7(v) for v in vals]


def py_le_hex(v: int) -> str:
    return struct.pack("<d", float(v)).hex().upper()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-(2 ** 50), 2 ** 50),
                min_size=1, max_size=50))
def test_le_double_hex_matches_struct(duck, vals):
    rows = ", ".join(f"({v})" for v in vals)
    got = [r[0] for r in duck.sql(
        f"SELECT {_le_double_hex('v')} FROM (VALUES {rows}) t(v)"
    ).fetchall()]
    assert got == [py_le_hex(v) for v in vals]


def test_le_double_hex_edges(duck):
    for v in (0, 1, -1, 2 ** 52 - 1, -(2 ** 52 - 1), 10 ** 7,
              -(10 ** 7), 2, -2, 3, 1023, 1025):
        got = duck.sql(f"SELECT {_le_double_hex(str(v))}").fetchone()[0]
        assert got == py_le_hex(v), v
