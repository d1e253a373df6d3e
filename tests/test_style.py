"""X16 style / minzoom mechanism."""

import pandas as pd

from osmquadtree_rust_bindings_spark.functions import style as S


def test_default_roundtrip():
    st = S.default_style()
    assert st["z_order"]["highway"]["motorway"] == 380
    spec = S.parse_minzoom(S.default_minzoom_values())
    assert spec == S.DEFAULT_MINZOOM_VALUES


def test_render_attrs(spark):
    rows = [
        (1, {"highway": "motorway"}),
        (2, {"highway": "service", "layer": "2"}),
        (3, {"building": "yes"}),
        (4, {"name": "nowhere"}),
        (5, {"waterway": "stream", "layer": "x"}),  # bad layer -> 0
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "tags"]),
        schema="id long, tags map<string,string>")
    got = S.with_render_attrs(df).toPandas().set_index("id")
    assert got.loc[1, "z_order"] == 380 and got.loc[1, "minzoom"] == 5
    assert got.loc[2, "layer"] == 2 and got.loc[2, "minzoom"] == 14
    assert got.loc[3, "minzoom"] == 13 and got.loc[3, "z_order"] == 0
    assert pd.isna(got.loc[4, "minzoom"])
    assert got.loc[5, "layer"] == 0 and got.loc[5, "minzoom"] == 13


def test_first_matching_minzoom_rule_wins(spark):
    spec = [("highway", "motorway", 5), ("highway", "*", 12)]
    df = spark.createDataFrame(
        pd.DataFrame([(1, {"highway": "motorway"}),
                      (2, {"highway": "footpath"})],
                     columns=["id", "tags"]),
        schema="id long, tags map<string,string>")
    got = S.with_render_attrs(df, minzoom_spec=spec).toPandas().set_index("id")
    assert got.loc[1, "minzoom"] == 5
    assert got.loc[2, "minzoom"] == 12
