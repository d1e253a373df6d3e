"""Differential compare (J6) and CDC merge/apply (J3-J5).

Reference:
- ``compare_pbf_files`` (/root/reference/src/count.rs:528-574): align two
  sorted element streams on (type, id), classify every divergence
  (OnlyLeft/OnlyRight/DifferentData/.../Same) — the golden-diff operator.
- ``combine_primitive`` (src/elements.rs:1015-1020): keep latest version.
- ``apply_change_primitive`` (src/elements.rs:1022-1027): delete/remove
  drop, create/modify replace, unchanged keep.
- base+change k-way block merge (src/readpbf.rs:634-640).

Spark shapes: full-outer join + struct compare; window latest-wins;
changetype CASE semantics.  With Iceberg these become MERGE INTO; the
DataFrame forms below are storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# reference changetype enum (src/elements.rs:576-598)
CT_NORMAL, CT_DELETE, CT_REMOVE = "normal", "delete", "remove"
CT_MODIFY, CT_UNCHANGED, CT_CREATE = "modify", "unchanged", "create"
DROP_TYPES = (CT_DELETE, CT_REMOVE)


def compare_datasets(left: DataFrame, right: DataFrame, key: list[str],
                     compare_cols: list[str],
                     max_result_len: int | None = None) -> DataFrame:
    """J6: full-outer join on ``key``; classify each key as only_left /
    only_right / different_<col> / same.  ``max_result_len`` caps the
    non-same rows like the reference's result cap (src/count.rs:529)."""
    lsel = left.select(*key, F.lit(True).alias("__l_present"),
                       *[F.col(c).alias(f"__l_{c}") for c in compare_cols])
    rsel = right.select(*key, F.lit(True).alias("__r_present"),
                        *[F.col(c).alias(f"__r_{c}") for c in compare_cols])
    j = lsel.join(rsel, key, "full_outer")
    has_l = F.coalesce(F.col("__l_present"), F.lit(False))
    has_r = F.coalesce(F.col("__r_present"), F.lit(False))
    cls = F.when(~has_r, F.lit("only_left")).when(~has_l, F.lit("only_right"))
    for c in compare_cols:
        cls = cls.when(
            ~(F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))),
            F.lit(f"different_{c}"))
    cls = cls.otherwise(F.lit("same"))
    out = j.select(*key, cls.alias("diff_class"))
    if max_result_len is not None:
        diffs = out.filter(F.col("diff_class") != "same") \
            .orderBy(*key).limit(max_result_len)
        return diffs
    return out


def diff_summary(left: DataFrame, right: DataFrame, key: list[str],
                 compare_cols: list[str]) -> DataFrame:
    """Aggregate counts per diff class (compare_pbf_files' returned count)."""
    return (
        compare_datasets(left, right, key, compare_cols)
        .groupBy("diff_class").count().orderBy("diff_class")
    )


def changed_usernames(left: DataFrame, right: DataFrame, uid_col: str,
                      name_col: str) -> DataFrame:
    """The ChangedUserName arm of compare_pbf_files (reference
    src/count.rs:540-556): distinct (uid, left_name, right_name) triples
    where the SAME uid carries a different name on each side — user
    renames, reported separately from per-element divergences.  Two
    distinct-projections + one equi-join on uid; at scale both sides
    reduce to the (small) user dimension before the join."""
    l = left.select(F.col(uid_col).alias("uid"),
                    F.col(name_col).alias("left_name")).distinct()
    r = right.select(F.col(uid_col).alias("uid"),
                     F.col(name_col).alias("right_name")).distinct()
    return l.join(r, "uid").filter(
        ~F.col("left_name").eqNullSafe(F.col("right_name")))


def merge_latest(df: DataFrame, key: list[str],
                 version: str = "version") -> DataFrame:
    """J3/J4: latest-version-wins merge of overlapping snapshots.

    ``row_number() over (partition by key order by version desc) = 1`` —
    the Spark form of the reference's k-way merge by id keeping max version
    (combine_primitive, src/elements.rs:1015-1020).  Deterministic: ties
    broken by all key cols (caller should include a source rank in
    ``version`` ordering if versions can tie).
    """
    w = Window.partitionBy(*key).orderBy(F.col(version).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )


def apply_changes(base: DataFrame, changes: DataFrame, key: list[str],
                  changetype: str = "changetype") -> DataFrame:
    """J5: CDC apply — delete/remove drop the row, create/modify replace,
    unchanged keeps base (apply_change_primitive, src/elements.rs:1022-1027).

    Equivalent to Iceberg ``MERGE INTO base USING changes ... WHEN MATCHED
    AND ct IN ('delete','remove') THEN DELETE WHEN MATCHED THEN UPDATE
    WHEN NOT MATCHED AND ct NOT IN (...) THEN INSERT``.
    """
    eff = changes.filter(~F.col(changetype).isin(*DROP_TYPES)) \
        .filter(F.col(changetype) != CT_UNCHANGED)
    dropped = changes.filter(F.col(changetype).isin(*DROP_TYPES)) \
        .select(*key)
    replaced = changes.select(*key)
    kept = base.join(replaced, key, "left_anti")
    cols = base.columns
    return kept.select(*cols).unionByName(
        eff.select(*cols)).join(dropped, key, "left_anti")


def compare_datasets_json(left: DataFrame, right: DataFrame, key: list[str],
                          compare_cols: list[str],
                          max_result_len: int | None = None) -> DataFrame:
    """compare_pbf_files_json (src/count.rs:558-574): the J6 diff rows
    serialized as one JSON object per divergence — (diff_class, doc json).
    Pure ``to_json(struct(...))``; same classification as
    compare_datasets."""
    out = compare_datasets(left, right, key, compare_cols, max_result_len)
    if max_result_len is None:
        out = out.filter(F.col("diff_class") != "same")
    return out.select(
        "diff_class",
        F.to_json(F.struct(*key, F.col("diff_class"))).alias("doc"))
