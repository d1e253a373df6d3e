"""Human formatting + enum codecs (reference X13/X14).

- ``bytes_str`` / ``min_sec_str``: human-readable sizes and durations
  (/root/reference/osmquadtree_rust_bindings/__init__.py:29-39, 127-133).
- changetype / elementtype string codecs with 1-letter aliases
  (/root/reference/src/elements.rs:558-598); Column form is a chained
  CASE (stays in codegen) for the CDC columns used by J5/J6.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CHANGETYPES = ["normal", "delete", "remove", "modify", "unchanged", "create"]
CHANGETYPE_ALIAS = {"": "normal", "n": "normal", "d": "delete",
                    "r": "remove", "m": "modify", "u": "unchanged",
                    "c": "create"}
ELEMENTTYPES = {"n": "node", "w": "way", "r": "relation"}


def bytes_str(num) -> str:
    """Reference-exact: '??' for negatives, %6d bytes below 1.5k, then
    %6.1f at 1.5x-stepped k/M/G thresholds (__init__.py:29-39)."""
    if num < 0:
        return "??"
    if num < 1024 * 1.5:
        return "%6db" % (num,)
    if num < 1024 * 1024 * 1.5:
        return "%6.1fkb" % (num / 1024.0,)
    if num < 1024 * 1024 * 1024 * 1.5:
        return "%6.1fMb" % (num / 1024.0 / 1024.0,)
    return "%6.1fGb" % (num / 1024.0 / 1024.0 / 1024.0,)


def min_sec_str(t) -> str:
    """Reference-exact (__init__.py:127-133): right-padded seconds below
    90s, else '%4dm%4.1fs'."""
    if t < 90:
        return "     %4.1fs" % t
    mins = int(t / 60)
    return "%4dm%4.1fs" % (mins, t - mins * 60)


def _decode(col: Column, table: dict[str, str]) -> Column:
    out = col
    for short, full in table.items():
        out = F.when(col == short, F.lit(full)).otherwise(out)
    return out


def changetype_decode(col: Column) -> Column:
    """1-letter alias -> full changetype name (full names pass through)."""
    return _decode(col, CHANGETYPE_ALIAS)


def changetype_encode(col: Column) -> Column:
    """full name -> 1-letter alias."""
    return _decode(col, {v: k for k, v in CHANGETYPE_ALIAS.items()})


def elementtype_decode(col: Column) -> Column:
    return _decode(col, ELEMENTTYPES)


def elementtype_encode(col: Column) -> Column:
    return _decode(col, {v: k for k, v in ELEMENTTYPES.items()})
