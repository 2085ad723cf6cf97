"""Table maintenance: upsert (MERGE analog) and compaction (OPTIMIZE
analog) on plain parquet tables.

The reference docx declares intent the notebooks never implement
(docx §"Data Write": "upsert to Silver", "optimize and vacuum
periodically" — SURVEY.md §4): the code actually full-overwrites. This
module supplies the real operations, Delta-free:

- ``merge_upsert``: keyed MERGE = target ∖ updates (left-anti) ∪ updates,
  rewritten atomically via overwrite. Correct but rewrites the table —
  use for dims/small tables.
- ``partition_upsert``: the 100 TB path — only partitions present in the
  update batch are rewritten (dynamic partition overwrite); untouched
  partitions are never read or written. A daily 1-partition update to a
  3-year table costs 1/1000th of the full rewrite.
- ``compact_table``: rewrite a table (or partition subset) into
  ``target_files`` files per partition — the small-files fix after many
  appends.

Vacuum has no parquet analog (overwrite replaces data in place via the
metastore swap); with Delta installed, ``OPTIMIZE``/``VACUUM`` slot in
here unchanged.
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def merge_upsert(
    spark: SparkSession, table: str, updates: DataFrame, keys: Sequence[str]
) -> int:
    """Keyed upsert: rows in ``updates`` replace same-key rows in
    ``table``; new keys insert. Returns the new row count.

    When the table is Delta and the session has the Delta extension
    (``sinks.delta_enabled``), this dispatches to a native ``MERGE
    INTO`` — transactional, no staged-table barrier, and only touched
    files rewrite (the docx §"Data Write" upsert intent, first-class).
    The portable parquet path below stays the default everywhere else:
    one left-anti shuffle on the keys + union + full rewrite.
    """
    target = spark.table(table)
    missing = set(target.columns) ^ set(updates.columns)
    if missing:
        raise ValueError(f"upsert schema mismatch on columns: {sorted(missing)}")
    if _is_delta_table(spark, table):
        return _merge_upsert_delta(spark, table, updates, keys)
    kept = target.join(updates.select(*keys), on=list(keys), how="left_anti")
    merged = kept.unionByName(updates)
    return _overwrite_via_staged(spark, table, merged)


def _is_delta_table(spark: SparkSession, table: str) -> bool:
    """True when ``table`` is a Delta table in a Delta-capable session
    (both conditions required: a delta provider without the extension
    fails at commit time, and a capable session may still hold parquet
    tables)."""
    from grocery_store_sales_forecasting_etl_pipeline_spark.sources.sinks import delta_enabled

    if not delta_enabled(spark):
        return False
    try:
        detail = spark.sql(f"DESCRIBE DETAIL {table}").collect()[0]
        return (detail.format or "").lower() == "delta"
    except Exception:  # noqa: BLE001 — non-Delta catalogs raise here
        return False


def _merge_upsert_delta(
    spark: SparkSession, table: str, updates: DataFrame, keys: Sequence[str]
) -> int:
    """Native ``MERGE INTO`` (requires delta-spark + extension; callers
    go through ``merge_upsert`` which verifies both). Matched keys
    replace whole rows, new keys insert, with plain ``=`` key equality
    so NULL keys never match — the same as the parquet path's left-anti
    join (a null-safe ``<=>`` here would replace NULL-key target rows
    the parquet path keeps). One semantic divergence remains by design:
    updates carrying DUPLICATE keys raise Delta's
    multiple-source-rows-match error here, while the parquet path
    silently inserts both — the error is the better behavior, and the
    portable path's laxity is documented at the call site. Scale:
    Delta's file-level pruning rewrites only files containing matched
    keys — no staged barrier, no full-table rewrite, and the
    transaction log makes the swap atomic."""
    from delta.tables import DeltaTable  # gated: container may not ship delta

    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (
        DeltaTable.forName(spark, table)
        .alias("t")
        .merge(updates.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return spark.table(table).count()


def _table_partition_cols(spark: SparkSession, table: str) -> list[str]:
    """The table's partition columns from the catalog (empty when
    unpartitioned) — one metadata call, no data scan."""
    return [c.name for c in spark.catalog.listColumns(table) if c.isPartition]


def _overwrite_via_staged(spark: SparkSession, table: str, merged: DataFrame) -> int:
    # re-apply the table's own partitioning on the rewrite: without this
    # the first merge_upsert on a partitioned table silently flattens it
    # (values stay correct; partition pruning is lost)
    part_cols = _table_partition_cols(spark, table)
    # materialize before overwriting the table being read
    merged.cache()
    n = merged.count()
    merged.write.mode("overwrite").format("parquet").saveAsTable(f"{table}__staged")
    staged = spark.table(f"{table}__staged")
    w = staged.write.mode("overwrite").format("parquet")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.saveAsTable(table)
    spark.sql(f"DROP TABLE {table}__staged")
    merged.unpersist()
    return n


def partition_upsert(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_cols: Sequence[str],
    check_key_movement: bool = False,
) -> int:
    """Partition-scoped upsert: merge ``updates`` into only the
    partitions they touch, leaving every other partition untouched
    (dynamic partition overwrite — ``partitionOverwriteMode=dynamic``).

    Returns rows written. ``partition_cols`` must be the table's
    partitioning; update rows must carry them.

    Key-stability contract: a key is assumed to stay in its partition
    (the norm for date-partitioned facts, where the partition column is
    part of the key). If an update row re-homes an existing key to a
    DIFFERENT partition, the stale copy in the old partition survives —
    only affected partitions are scanned. Pass
    ``check_key_movement=True`` to detect that case and raise; it costs
    a scan of the unaffected partitions, which is exactly what this
    operator otherwise avoids, so it is opt-in.
    """
    # the affected-partition set is small by construction (a daily batch
    # touches a few partitions) — broadcast it as a semi-join filter
    affected = updates.select(*partition_cols).distinct()
    target = spark.table(table)
    if check_key_movement:
        moved = (
            target.join(F.broadcast(affected), on=list(partition_cols), how="left_anti")
            .join(updates.select(*keys).distinct(), on=list(keys), how="left_semi")
        )
        if moved.limit(1).count() > 0:
            raise ValueError(
                "partition_upsert: update keys exist in partitions outside the "
                "update batch (cross-partition key movement); use merge_upsert "
                "or delete the old rows first"
            )
    old_affected = target.join(F.broadcast(affected), on=list(partition_cols), how="left_semi")
    kept = old_affected.join(updates.select(*keys), on=list(keys), how="left_anti")
    # USING-joins move key columns first; insertInto is POSITIONAL —
    # restore the table's column order explicitly
    merged = kept.unionByName(updates.select(*target.columns)).select(*target.columns)
    # REAL materialization barrier (merge_upsert's __staged pattern): the
    # merged plan reads the same partitions the dynamic overwrite below
    # rewrites. cache()+count() is NOT a barrier — lost cached blocks
    # (executor failure/eviction) would recompute from the
    # partially-overwritten source and silently corrupt the table.
    # per-run unique suffix: two concurrent upserts on the same table must
    # not share a staged name (the second overwrite would clobber the
    # first's materialization barrier mid-flight)
    staged_name = f"{table}__staged_parts_{uuid.uuid4().hex[:12]}"
    merged.write.mode("overwrite").format("parquet").saveAsTable(staged_name)
    try:
        staged = spark.table(staged_name)
        n = staged.count()
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # insertInto with dynamic mode: only partitions present in
            # `staged` are overwritten
            staged.select(*target.columns).write.mode("overwrite").insertInto(table)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    finally:
        # always drop — a failed insertInto must not leak the staged table
        spark.sql(f"DROP TABLE IF EXISTS {staged_name}")
    return n


def compact_table(
    spark: SparkSession,
    table: str,
    target_files: int = 1,
    partition_cols: Sequence[str] = (),
) -> None:
    """OPTIMIZE analog: rewrite the table with ``target_files`` files
    (per partition when partitioned) to fix small-file proliferation
    from appends. Uses repartition so the write is parallel."""
    def _write(df: DataFrame, name: str) -> None:
        w = df.write.mode("overwrite").format("parquet")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.saveAsTable(name)

    df = spark.table(table)
    if partition_cols:
        df = df.repartition(target_files, *[F.col(c) for c in partition_cols])
    else:
        df = df.repartition(target_files)
    # stage → swap: never overwrite a parquet table from a plan that is
    # still reading it
    _write(df, f"{table}__compacted")
    _write(spark.table(f"{table}__compacted"), table)
    spark.sql(f"DROP TABLE {table}__compacted")


def scd2_merge(
    current: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    version: int,
    *,
    validate: bool = False,
    close_missing: bool = True,
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: fold a new full snapshot
    of a dimension into an SCD2 history table (attribute columns +
    ``valid_from``/``valid_to`` version stamps, ``valid_to IS NULL`` =
    open row). Per natural key:

    - attributes unchanged → the open row passes through untouched
    - attributes changed → the open row closes (``valid_to = version``)
      and a new open row starts (``valid_from = version``)
    - key absent from the snapshot → the open row closes (deletion)
    - key new in the snapshot → a new open row starts
    - already-closed rows are immutable history and pass through

    All snapshot attribute columns are tracked (null-safe comparison).
    The upsert pipeline (``merge_upsert``) keeps latest-only; this is
    the history-preserving variant a warehouse needs for
    point-in-time joins ("what segment was this customer in when the
    order shipped?").

    PRECONDITION: the natural key is unique in ``snapshot``, and
    ``current`` has at most one open row per key — duplicates fan out
    through the full-outer join and emit conflicting history rows.
    Pass ``validate=True`` to assert both with two cheap key-only
    aggregates before the merge (two extra jobs, so off by default;
    the single-join merge plan itself is unchanged either way).

    Scale notes: ONE equi-join of the open rows against the snapshot on
    the natural key, then a conditional array-explode emits 1-2 rows
    per key — branching via a union of filters would re-execute the
    join once per branch (4 scans). Closed history is unioned back
    without being read beyond its scan; at 100 TB, partition the
    history table by ``valid_to IS NULL`` so the merge reads only the
    open slice.
    """
    from functools import reduce
    from operator import or_

    attrs = [c for c in snapshot.columns if c not in keys]
    if validate:
        dup_snap = (
            snapshot.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dup_snap:
            raise ValueError(
                f"scd2_merge: snapshot has duplicate natural keys, e.g. "
                f"{dup_snap[0].asDict()}"
            )
        dup_open = (
            current.filter(F.col("valid_to").isNull())
            .groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup_open:
            raise ValueError(
                f"scd2_merge: current has multiple OPEN rows for a key, e.g. "
                f"{dup_open[0].asDict()}"
            )
    if not attrs:
        raise ValueError(
            "snapshot has no attribute columns beyond the keys — nothing "
            "to track; SCD2 needs at least one tracked attribute"
        )
    expected = [*keys, *attrs, "valid_from", "valid_to"]
    if sorted(current.columns) != sorted(expected):
        raise ValueError(
            f"current SCD2 columns {sorted(current.columns)} != {sorted(expected)}"
        )
    open_rows = current.filter(F.col("valid_to").isNull()).withColumn(
        "__in_cur", F.lit(1)
    )
    closed_rows = current.filter(F.col("valid_to").isNotNull())
    snap = snapshot.select(
        *[F.col(k) for k in keys],
        *[F.col(a).alias(f"__s_{a}") for a in attrs],
        F.lit(1).alias("__in_new"),
    )
    j = open_rows.join(snap, list(keys), "full_outer")
    in_cur = F.col("__in_cur").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    changed = reduce(
        or_, [~F.col(a).eqNullSafe(F.col(f"__s_{a}")) for a in attrs]
    )
    ver = F.lit(version).cast("long")
    null_ver = F.lit(None).cast("long")
    cur_open = F.struct(
        *[F.col(a).alias(a) for a in attrs],
        F.col("valid_from").alias("valid_from"),
        F.col("valid_to").alias("valid_to"),
    )
    cur_closed = F.struct(
        *[F.col(a).alias(a) for a in attrs],
        F.col("valid_from").alias("valid_from"),
        ver.alias("valid_to"),
    )
    new_open = F.struct(
        *[F.col(f"__s_{a}").alias(a) for a in attrs],
        ver.alias("valid_from"),
        null_ver.alias("valid_to"),
    )
    out = (
        F.when(in_cur & in_new & ~changed, F.array(cur_open))
        .when(in_cur & in_new & changed, F.array(cur_closed, new_open))
        # full-snapshot semantics close a key the snapshot no longer
        # carries; CDC-changes semantics (close_missing=False, see
        # scd2_apply_changes) leave untouched keys open
        .when(in_cur & ~in_new, F.array(cur_closed if close_missing else cur_open))
        .otherwise(F.array(new_open))
    )
    merged = j.select(
        *[F.col(k) for k in keys], F.explode(out).alias("__r")
    ).select(*keys, "__r.*")
    return closed_rows.select(*merged.columns).unionByName(merged)


def scd2_apply_changes(
    current: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    version: int,
    *,
    validate: bool = False,
) -> DataFrame:
    """CDC variant of ``scd2_merge``: ``changes`` is a PARTIAL set of
    upserted rows (a micro-batch, a CDC feed), not a full snapshot —
    keys absent from ``changes`` keep their open row instead of being
    closed as deletions. Changed keys close-and-reopen, new keys open,
    attribute-identical rows are no-ops; applying the same change set
    twice at the same version is therefore idempotent, which is what
    makes this safe under Structured Streaming's at-least-once
    foreachBatch replay (see ``streaming.events.stream_scd2_to_table``).
    Same single-join + conditional-array-explode plan, same
    preconditions (unique keys in ``changes``; ``validate=True`` to
    assert)."""
    return scd2_merge(
        current,
        changes,
        keys,
        version,
        validate=validate,
        close_missing=False,
    )
