"""Unit semantics of the MERGE/upsert and compaction operators (the oracle
queries exercise the aggregate shape; these pin the row-level contract)."""

from __future__ import annotations

import pyspark.sql.functions as F

from eventstream_spark.operators.merge import latest_per_key, merge_upsert


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_upsert_update_insert_carryover(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "k int, s string, v double"
    )
    got = _rows(merge_upsert(target, source, keys=["k"]))
    assert got == {
        (1, "a", 10.0),  # target-only carries over
        (2, "B", 200.0),  # matched: source wins
        (3, "c", 30.0),
        (4, "d", 40.0),  # source-only inserts
    }


def test_merge_upsert_null_source_field_falls_back_to_target(spark):
    """Partial updates: a NULL source column keeps the target's value —
    the column-level MERGE WHEN MATCHED THEN UPDATE SET semantics."""
    target = spark.createDataFrame([(1, "a", 10.0)], "k int, s string, v double")
    source = spark.createDataFrame([(1, None, 99.0)], "k int, s string, v double")
    got = _rows(merge_upsert(target, source, keys=["k"]))
    assert got == {(1, "a", 99.0)}


def test_latest_per_key_total_order(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "k int, seq int, payload string",
    )
    got = _rows(latest_per_key(df, keys=["k"], order_cols=["seq"]))
    assert got == {(1, 20, "new"), (2, 5, "only")}


def test_latest_per_key_tiebreak_is_deterministic(spark):
    """Equal primary order column: the secondary column must decide."""
    df = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 10, 200, "b")], "k int, seq int, sub int, p string"
    )
    got = _rows(latest_per_key(df, keys=["k"], order_cols=["seq", "sub"]))
    assert got == {(1, 10, 200, "b")}


def test_write_partitioned_layout_and_pruning(spark, tmp_path):
    """The export layout contract: hive-style partition directories,
    maxRecordsPerFile respected, and a partition-filtered read that prunes
    to one directory (the scan's partition count equals the value's file
    count, so the filter was resolved from paths, not data)."""
    import glob
    import os

    from eventstream_spark.operators.merge import write_partitioned

    df = spark.range(100).selectExpr("id", "CAST(id % 3 AS STRING) AS bucket")
    path = str(tmp_path / "export")
    write_partitioned(df, path, ["bucket"], max_records_per_file=10)

    dirs = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(path, "bucket=*"))
    )
    assert dirs == ["bucket=0", "bucket=1", "bucket=2"]
    for f in glob.glob(os.path.join(path, "bucket=*", "*.parquet")):
        n = spark.read.parquet(f).count()
        assert n <= 10, f"{f} has {n} rows > maxRecordsPerFile"

    back = spark.read.parquet(path).where(F.col("bucket") == "1")
    assert back.count() == 33
    # Execution-time pruning: every file actually opened is under bucket=1
    # (inputFiles() reflects the pre-filter relation, so ask the rows).
    files_read = [
        r[0] for r in back.select(F.input_file_name()).distinct().collect()
    ]
    assert files_read and all("bucket=1" in f for f in files_read), files_read


def test_merge_into_partitioned_cow_swaps_only_affected(spark, tmp_path):
    """Copy-on-write layout contract: a delta touching ONE partition
    rewrites exactly that partition (plus any brand-new ones); every other
    partition's files keep their inodes and mtimes — never read, never
    rewritten. No staging or .bak residue survives the swap."""
    import os

    from eventstream_spark.operators.merge import merge_into_partitioned

    table_dir = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 2020), (2, "b", 2020), (3, "c", 2021), (4, "d", 2022)],
        "k int, s string, yr int",
    ).write.partitionBy("yr").parquet(table_dir)

    def stats(year):
        d = os.path.join(table_dir, f"yr={year}")
        return {
            f: (os.stat(os.path.join(d, f)).st_ino,
                os.stat(os.path.join(d, f)).st_mtime_ns)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before = {y: stats(y) for y in (2020, 2021, 2022)}
    # Update k=3 (lives in 2021) and insert k=9 into a NEW partition 2023.
    source = spark.createDataFrame(
        [(3, "C", 2021), (9, "z", 2023)], "k int, s string, yr int"
    )
    out = merge_into_partitioned(spark, table_dir, source, keys=["k"], partition_col="yr")
    assert out == {"partitions_rewritten": 2, "partitions_untouched": 2}

    # Untouched partitions: bytes, inodes, mtimes all identical.
    assert stats(2020) == before[2020]
    assert stats(2022) == before[2022]
    # Affected partition was swapped (new files), new partition appeared.
    assert stats(2021) != before[2021]
    assert os.path.isdir(os.path.join(table_dir, "yr=2023"))
    # No residue from staging or swap.
    assert not os.path.exists(table_dir + ".merge_staging")
    assert not any("merge_bak" in e for e in os.listdir(table_dir))
    # And the snapshot is the merged table.
    got = {tuple(r) for r in spark.read.parquet(table_dir).select("k", "s", "yr").collect()}
    assert got == {(1, "a", 2020), (2, "b", 2020), (3, "C", 2021), (4, "d", 2022), (9, "z", 2023)}


def test_merge_into_partitioned_key_moves_partition(spark, tmp_path):
    """A matched key whose source row lands in a different partition must
    leave exactly one copy — in the new partition."""
    from eventstream_spark.operators.merge import merge_into_partitioned

    table_dir = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 2020), (2, "b", 2021)], "k int, s string, yr int"
    ).write.partitionBy("yr").parquet(table_dir)
    source = spark.createDataFrame([(1, "A", 2021)], "k int, s string, yr int")
    merge_into_partitioned(spark, table_dir, source, keys=["k"], partition_col="yr")
    got = {tuple(r) for r in spark.read.parquet(table_dir).select("k", "s", "yr").collect()}
    assert got == {(1, "A", 2021), (2, "b", 2021)}


def test_zorder_write_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """The materialized z-order layout must produce real multi-file
    parquet whose per-FILE min/max spans are bounded in BOTH key
    dimensions — the property a linear sort cannot give its non-sort key.
    16 whole curve tiles over 32x32 buckets → each file covers 8 of 32
    quantile buckets per axis (≤ ~1/4 of each axis in bucket space; the
    value-space bound below allows quantile slack)."""
    from eventstream_spark.operators.merge import zorder_write

    out = str(tmp_path / "zo")
    stats = zorder_write(spark, sf_dir, out, n_files=16).collect()
    assert len(stats) >= 8  # real multi-file layout
    gx = max(r.max_x for r in stats)
    gy = max(r.max_y for r in stats)
    for r in stats:
        assert (r.max_x - r.min_x) <= 0.6 * gx
        assert (r.max_y - r.min_y) <= 0.6 * gy
