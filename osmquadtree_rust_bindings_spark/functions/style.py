"""X16 GeometryStyle / MinZoomSpec (reference src/geometry.rs:709-758,
816-825: ``prep_style``, ``prep_minzoom``, ``default_style``,
``default_minzoom_values``).

The reference's literal default values live in the non-vendored upstream
crate, so — like the §8 math spec — the defaults below are PINNED
normative values for this engine (same shape: a JSON feature-style table
and a (key, value, minzoom) spec).  The mechanism is the parity surface:
a style drives per-feature render attributes (layer, z_order, minzoom)
as a single chained-CASE Column expression, evaluated in codegen over the
tags map — no Python in the path.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STYLE: dict = {
    "feature_keys": ["highway", "building", "waterway", "landuse",
                     "natural", "amenity"],
    "other_keys": ["name", "layer", "level"],
    "polygon_tags": ["building", "landuse", "natural", "amenity"],
    "z_order": {
        "highway": {"motorway": 380, "trunk": 370, "primary": 360,
                    "secondary": 350, "tertiary": 340, "residential": 330,
                    "unclassified": 330, "service": 150},
        "railway": {"rail": 440},
        "waterway": {"river": 120, "canal": 120, "stream": 60},
    },
}

DEFAULT_MINZOOM_VALUES: list[tuple[str, str, int]] = [
    ("highway", "motorway", 5), ("highway", "trunk", 6),
    ("highway", "primary", 7), ("highway", "secondary", 9),
    ("highway", "tertiary", 10), ("highway", "residential", 12),
    ("highway", "unclassified", 12), ("highway", "service", 14),
    ("waterway", "river", 8), ("waterway", "canal", 11),
    ("waterway", "stream", 13),
    ("building", "*", 13), ("landuse", "*", 10), ("natural", "*", 8),
    ("amenity", "*", 14),
]


def default_style() -> dict:
    """Reference ``default_style()``: the style as a JSON-able object."""
    return json.loads(json.dumps(DEFAULT_STYLE))


def default_minzoom_values() -> str:
    """Reference ``default_minzoom_values()``: the spec as CSV text
    (key,value,minzoom per line, like MinZoomSpec::from_reader input)."""
    return "\n".join(f"{k},{v},{z}" for k, v, z in DEFAULT_MINZOOM_VALUES)


def parse_minzoom(text: str) -> list[tuple[str, str, int]]:
    """MinZoomSpec::from_reader: parse 'key,value,minzoom' lines."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        k, v, z = (p.strip() for p in line.split(","))
        out.append((k, v, int(z)))
    return out


def z_order_col(tags: Column, style: dict | None = None) -> Column:
    """Per-feature z_order from the tags map (chained CASE, codegen)."""
    style = style if style is not None else DEFAULT_STYLE
    out = F.lit(0)
    for key, table in style["z_order"].items():
        v = tags.getItem(key)
        for val, z in table.items():
            out = F.when(v == val, F.lit(z)).otherwise(out)
    return out


def minzoom_col(tags: Column,
                spec: list[tuple[str, str, int]] | None = None) -> Column:
    """Per-feature minzoom; '*' matches any value of the key; null when no
    rule matches (feature not shown at any zoom — reference Option<i64>)."""
    spec = spec if spec is not None else DEFAULT_MINZOOM_VALUES
    out = F.lit(None).cast("int")
    # later rules must not override earlier ones: build CASE inside-out in
    # reverse so the FIRST matching line wins, like a linear scan
    for k, v, z in reversed(spec):
        cond = (tags.getItem(k).isNotNull() if v == "*"
                else (tags.getItem(k) == v))
        out = F.when(cond, F.lit(z)).otherwise(out)
    return out


def with_render_attrs(df: DataFrame, tags_col: str = "tags",
                      style: dict | None = None,
                      minzoom_spec=None) -> DataFrame:
    """prep_style + prep_minzoom applied: adds layer (from the 'layer'
    tag, 0 default), z_order, minzoom columns."""
    tags = F.col(tags_col)
    layer = F.coalesce(tags.getItem("layer").try_cast("int"), F.lit(0))
    return df.withColumns({
        "layer": layer,
        "z_order": z_order_col(tags, style),
        "minzoom": minzoom_col(tags, minzoom_spec),
    })
