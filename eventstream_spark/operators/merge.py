"""MERGE / upsert and change-log compaction — the lakehouse write-path
operators (MERGE INTO, CDC compaction) expressed as pure DataFrame plans.

Without a transactional table format (Delta/Iceberg, not in this
container) MERGE is a full-outer join + column coalesce producing the new
table snapshot; with one, the same logical spec drives a transactional
MERGE INTO and only touches matched files. The reference has no
table-maintenance surface at all (SURVEY §2 Part A negatives) — these are
the north-star warehouse additions.

Scale notes (100 TB): the merge join shuffles both sides on the key unless
the source (the delta batch — typically tiny vs the target) broadcasts,
which AQE decides from runtime stats; with a bucketed target
(sources/bucketed.py) the target side never shuffles at all. Latest-per-key
compaction is one window shuffle, and `WindowGroupLimit` bounds its state
to one row per key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col, lit

from ..cache import persist_tracked
from ..catalog import load
from ..functions import hash48, hash48_sql
from .ranking import _ranked_with_total, ntile_from_rank


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics over same-schema frames: rows matched on ``keys``
    take the source's non-null column values (partial updates fall back to
    the target's), source-only rows insert, target-only rows carry over.
    One full-outer join; every non-key column is a coalesce."""
    t, s = target.alias("t"), source.alias("s")
    joined = t.join(s, keys, "full_outer")
    others = [c for c in target.columns if c not in keys]
    return joined.select(
        *[col(k) for k in keys],
        *[F.coalesce(col(f"s.{c}"), col(f"t.{c}")).alias(c) for c in others],
    )


def q87_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO shape under the oracle gate: a synthetic delta batch
    (every 10th order re-priced and re-statused, every 97th cloned as a
    brand-new key) merged into orders; the result snapshot is checksummed
    per status. The oracle reproduces the same merge relationally."""
    orders = load(spark, sf_dir, "orders")
    updates = orders.where(col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        lit("X").alias("o_orderstatus"),
        # No per-row ROUND: double half-way cases round differently across
        # engines; the multiply itself is bit-identical and only the final
        # aggregate is rounded (the repo-wide determinism rule).
        (col("o_totalprice") * 1.1).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    inserts = orders.where(col("o_orderkey") % 97 == 0).select(
        (col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        lit("I").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    merged = merge_upsert(
        orders.select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ),
        updates.unionAll(inserts),
        keys=["o_orderkey"],
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


def merge_into_partitioned(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str,
) -> dict[str, int]:
    """Copy-on-write MERGE INTO a hive-partitioned parquet table — the
    transactional write path q87 computes but (without Delta/Iceberg in
    the environment) must hand-roll:

    1. affected partitions = source rows' partition values ∪ partitions
       holding a matched key (the latter found with a column-pruned
       (key, partition) semi-join scan — the price of no key index; a
       table format's min/max stats would prune it),
    2. merge ONLY those partitions' rows with the source (everything else
       is never read, rewritten, or opened — the trim_partitions
       property),
    3. write the merged rows to a STAGING dir partitioned the same way,
    4. swap each affected ``part=`` directory via atomic rename
       (old → .bak, staged → live, drop .bak).

    Partition-level atomicity is the parquet-dir bound: a crash between
    swaps leaves whole partitions at either the old or new snapshot,
    never half-written files (the staging write completed first). A
    transactional table format upgrades this to one atomic commit across
    partitions — the logical spec (merge_upsert) is unchanged.

    Scale: work is proportional to affected partitions + delta size, not
    table size. The source must carry ``partition_col``; a matched key
    whose source row lands in a different partition than its target row
    rewrites both (old row dropped with its partition's rewrite, new row
    staged into its new home).
    """
    import os
    import shutil

    target = spark.read.parquet(table_dir)
    src_parts = {
        r[0] for r in source.select(partition_col).distinct().collect()
    }
    matched_parts = {
        r[0]
        for r in (
            target.select(*keys, partition_col)
            .join(source.select(*keys).distinct(), keys, "left_semi")
            .select(partition_col)
            .distinct()
            .collect()
        )
    }
    affected = sorted(str(p) for p in src_parts | matched_parts)
    prefix = f"{partition_col}="
    existing = {
        e[len(prefix):]
        for e in os.listdir(table_dir)
        if e.startswith(prefix) and os.path.isdir(os.path.join(table_dir, e))
    }

    merged = merge_upsert(
        target.where(F.col(partition_col).cast("string").isin(affected)),
        source,
        keys,
    )
    staging = table_dir.rstrip("/") + ".merge_staging"
    (
        merged.repartition(col(partition_col))
        .write.partitionBy(partition_col)
        .mode("overwrite")
        .parquet(staging)
    )

    swapped = 0
    staged_parts = set()
    for e in sorted(os.listdir(staging)):
        if not e.startswith(prefix):
            continue
        staged_parts.add(e[len(prefix):])
        staged, live = os.path.join(staging, e), os.path.join(table_dir, e)
        bak = live + ".merge_bak"
        if os.path.isdir(live):
            os.rename(live, bak)
        os.rename(staged, live)
        if os.path.isdir(bak):
            shutil.rmtree(bak)
        swapped += 1
    # An affected partition with NO staged rows rewrote to empty (all its
    # rows moved to other partitions): the live directory must drop, or
    # the pre-merge copies would survive the swap.
    for p in affected:
        if p in existing and p not in staged_parts:
            shutil.rmtree(os.path.join(table_dir, prefix + p))
            swapped += 1
    shutil.rmtree(staging)
    return {
        "partitions_rewritten": swapped,
        "partitions_untouched": len(existing - set(affected)),
    }


def q87b_merge_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q87's MERGE executed through the copy-on-write WRITE path: orders
    is materialized as a year-partitioned parquet table in a temp dir, the
    same delta batch merges into it via staged write + per-partition
    atomic rename (merge_into_partitioned), and the checksum is computed
    from the table READ BACK off disk — so the files the swap produced,
    not an in-memory DataFrame, sit under q87's oracle. Any row lost,
    doubled, or half-written by the write path breaks the hash match."""
    import os
    import shutil
    import tempfile

    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]
    orders = load(spark, sf_dir, "orders").select(*cols)
    with_year = lambda df: df.withColumn(  # noqa: E731
        "o_year", F.year("o_orderdate")
    )
    tag = sf_dir.strip("/").replace("/", "_")
    table_dir = os.path.join(tempfile.gettempdir(), f"es_merge_cow_{tag}")
    shutil.rmtree(table_dir, ignore_errors=True)
    with_year(orders).write.partitionBy("o_year").parquet(table_dir)

    updates = orders.where(col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        lit("X").alias("o_orderstatus"),
        (col("o_totalprice") * 1.1).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    inserts = orders.where(col("o_orderkey") % 97 == 0).select(
        (col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        lit("I").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    merge_into_partitioned(
        spark,
        table_dir,
        with_year(updates.unionAll(inserts)),
        keys=["o_orderkey"],
        partition_col="o_year",
    )
    return (
        spark.read.parquet(table_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


def latest_per_key(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Change-log compaction: keep each key's latest record by the (total)
    ordering columns — the materialize-current-state step of a CDC
    pipeline. One window shuffle; WindowGroupLimit bounds per-key state."""
    w = Window.partitionBy(*keys).orderBy(*[col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(col("_rn") == 1)
        .drop("_rn")
    )


def q88_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current state per user from the events log: the latest event by
    (ts, event_id) — event_id makes the ordering total, so both engines
    pick the identical row."""
    ev = load(spark, sf_dir, "events")
    return latest_per_key(
        ev.select("user_id", "event_id", "ts", "event_type", "value"),
        keys=["user_id"],
        order_cols=["ts", "event_id"],
    ).orderBy("user_id")


def q93_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-relief parity under the oracle gate: the salted join (big side
    gets a deterministic row-hash salt, small side replicates per bucket)
    must produce exactly the rows of the plain equi-join — salting changes
    the shuffle layout, never the answer. The oracle is the PLAIN join."""
    from .skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(col("p_size") <= 10).select(
        "p_partkey", "p_brand"
    )
    joined = salted_join(
        li.select(col("l_partkey").alias("p_partkey"), "l_quantity"),
        part,
        on=["p_partkey"],
        how="inner",
        salt_buckets=8,
    )
    return (
        joined.groupBy("p_brand")
        .agg(F.count("*").alias("cnt"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy("p_brand")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    sort_within: list[str] | None = None,
) -> None:
    """Partitioned, size-bounded export — the training-data sharding layout.

    ``partitionBy`` gives hive-style directories (readers prune partitions
    from the path alone); ``maxRecordsPerFile`` bounds shard size so no
    downstream loader sees a monster file; an optional in-partition sort
    makes each shard's row order deterministic and its columns
    run-length-friendly. Repartitioning by the partition columns first
    means each task writes ONE open file per partition value it owns
    instead of every task writing every partition (the small-files
    explosion at 1000 executors)."""
    out = df.repartition(*[col(c) for c in partition_cols])
    if sort_within:
        out = out.sortWithinPartitions(*partition_cols, *sort_within)
    (
        out.write.partitionBy(*partition_cols)
        .option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(path)
    )


def q106_partitioned_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export path under the oracle gate: documents written as a
    hive-partitioned (by lang), shard-bounded parquet dataset, read back,
    and checksummed per partition. Any row lost, duplicated, or mangled by
    the write→read round trip breaks the hash match with the oracle, which
    aggregates the ORIGINAL table."""
    import os
    import tempfile

    docs = load(spark, sf_dir, "documents")
    tag = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"es_export_{tag}")
    write_partitioned(
        docs, path, ["lang"], max_records_per_file=2000, sort_within=["doc_id"]
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            # String-cast the checksum: the exact DECIMAL sum exceeds 2^53,
            # and pandas renders duckdb DECIMALs as float64, silently
            # dropping low bits — strings compare exactly.
            F.sum(hash48(col("text")).cast("decimal(38,0)"))
            .cast("string")
            .alias("text_sum"),
        )
        .orderBy("lang")
    )


def _interleave_bits(x, y, bits: int):
    """Morton/Z-value: interleave the low ``bits`` of x (even positions)
    and y (odd positions). Pure integer arithmetic — identical in any
    engine."""
    z = lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)
        )
    return z


def _layout_files(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(zorder, linear) file assignments over lineitem's (l_partkey,
    l_suppkey): 32×32 quantile buckets → 10-bit Z-value → 64 curve
    segments, vs a 64-way linear sort on x. Shared by q159 (span
    measurement) and q161 (skipping payoff)."""
    src = load(spark, sf_dir, "lineitem").select(
        col("l_partkey").alias("x"),
        col("l_suppkey").alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    # Two range exchanges total (one per ordering): the x-rank serves BOTH
    # the 32-bucket z-component and the 64-file linear layout via the
    # closed-form ntile_from_rank, and both layouts read one persisted frame.
    rx, n = _ranked_with_total(src, ["x", "l_orderkey", "l_linenumber"], "_rx")
    ry, _ = _ranked_with_total(rx, ["y", "l_orderkey", "l_linenumber"], "_ry")
    bxy = persist_tracked(
        ry.select(
            "x",
            "y",
            (ntile_from_rank(col("_rx"), n, 32) - 1).alias("px"),
            (ntile_from_rank(col("_ry"), n, 32) - 1).alias("py"),
            (ntile_from_rank(col("_rx"), n, 64) - 1).alias("flin"),
        )
    )
    zf = bxy.select(
        F.shiftright(_interleave_bits(col("px"), col("py"), 5), 4).alias(
            "file_id"
        ),
        "x",
        "y",
    )
    lf = bxy.select(col("flin").alias("file_id"), "x", "y")
    return zf, lf


def q159_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout vs a linear sort, measured: rank
    l_partkey and l_suppkey into 32 quantile buckets each, interleave the
    bucket bits into a 10-bit Z-value, carve the curve into 64 "files", and
    report the average per-file key span for both dimensions against the
    one-dimensional sort's layout. Z-order bounds BOTH spans (~√files
    shrink each) where the linear sort clusters only its own key — the
    min/max-skipping argument behind OPTIMIZE ZORDER BY in lakehouse
    engines.

    Scale: quantile bucketing uses scalable_ntile (range partition +
    closed-form bucket split — no single-task window; bit-identical to
    ANSI NTILE, which is what the oracle runs); the Z-value and file
    assignment are map-side integer ops; per-file min/max is one hash
    aggregation. The write path is ``df.repartitionByRange(F.col('zval'))
    .sortWithinPartitions('zval').write...`` — this query is the layout's
    measurement half, oracle-checkable."""
    zf, lf = _layout_files(spark, sf_dir)

    def stat(df: DataFrame, name: str) -> DataFrame:
        per_file = df.groupBy("file_id").agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        return per_file.agg(
            lit(name).alias("layout"),
            F.count("*").alias("n_files"),
            F.floor(F.avg("sx")).cast("long").alias("avg_span_x"),
            F.floor(F.avg("sy")).cast("long").alias("avg_span_y"),
        )
    return stat(zf, "zorder").unionByName(stat(lf, "linear")).orderBy("layout")


def zorder_write(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_files: int = 16,
) -> DataFrame:
    """The WRITE half of the z-order story: compute the Morton key over
    (l_partkey, l_suppkey), carve the curve at FIXED z boundaries
    (``file_id = zval div (1024 / n_files)`` — whole curve tiles, the
    same rule q161's measured skipping uses), and write real partitioned
    parquet — the OPTIMIZE ZORDER BY rewrite itself (q159/q161 measure
    the layout; this materializes it). Fixed boundaries matter: a
    SAMPLED range split can land mid-tile, and a file straddling a
    z-curve seam spans the full domain of one axis — the measured
    skipping guarantee only holds for whole tiles. Returns per-file
    min/max stats read back from the written data, i.e. the footer index
    a scan's data-skipping consults.

    Scale: one exchange on the file id (the clustering write always pays
    one) + the write; stats read-back is one aggregation. Tested in
    tests/test_merge.py: every physical file's key spans stay bounded in
    BOTH dimensions."""
    src = load(spark, sf_dir, "lineitem").select(
        col("l_partkey").alias("x"),
        col("l_suppkey").alias("y"),
        "l_orderkey",
        "l_linenumber",
    )
    rx, n = _ranked_with_total(src, ["x", "l_orderkey", "l_linenumber"], "_rx")
    ry, _ = _ranked_with_total(rx, ["y", "l_orderkey", "l_linenumber"], "_ry")
    z = ry.select(
        "x",
        "y",
        _interleave_bits(
            ntile_from_rank(col("_rx"), n, 32) - 1,
            ntile_from_rank(col("_ry"), n, 32) - 1,
            5,
        ).alias("zval"),
    )
    z = z.withColumn(
        "file_id", F.floor(col("zval") / lit(1024 // n_files)).cast("long")
    )
    (
        z.repartition("file_id")
        .sortWithinPartitions("file_id", "zval")
        .write.mode("overwrite")
        .partitionBy("file_id")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    return (
        back.groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .orderBy("file_id")
    )


def q161_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-skipping PAYOFF of q159's layouts: against each layout's
    per-file min/max stats (the parquet footer / manifest index), probe
    three predicate shapes — 4 x-only bands, 4 y-only bands, 4 (x,y)
    boxes, each band 1/8 of the key domain — and count the files a scan
    must open (a file is skipped when its [min,max] interval is disjoint
    from the probe in either dimension). The linear x-sort prunes x-bands
    perfectly and y-bands not at all; Z-order prunes BOTH — the
    multi-column-workload argument for Morton layout, measured.

    Scale: stats are one hash aggregation per layout (64 rows, persisted —
    the layout lineage must not recompute per consumer); the probe×stats
    evaluation is a broadcast nested loop over two tiny local relations —
    exactly how a real planner consults a manifest. Pure integer
    arithmetic end to end."""
    zf, lf = _layout_files(spark, sf_dir)
    unbounded = lit(4611686018427387904)  # 2^62: "no predicate on this dim"
    tagged = zf.select(lit("zorder").alias("layout"), "file_id", "x", "y").unionByName(
        lf.select(lit("linear").alias("layout"), "file_id", "x", "y")
    )
    stats = persist_tracked(
        tagged.groupBy("layout", "file_id").agg(
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )
    glob = stats.agg(F.max("max_x").alias("gx"), F.max("max_y").alias("gy"))
    bands = (
        spark.range(4)
        .select(col("id").alias("i"))
        .crossJoin(F.broadcast(glob))
        .select(
            "i",
            ((lit(2) * col("i")) * F.floor(col("gx") / 8) + 1).alias("bx_lo"),
            ((lit(2) * col("i")) * F.floor(col("gx") / 8) + 1 + F.floor(col("gx") / 8)).alias("bx_hi"),
            ((lit(2) * col("i")) * F.floor(col("gy") / 8) + 1).alias("by_lo"),
            ((lit(2) * col("i")) * F.floor(col("gy") / 8) + 1 + F.floor(col("gy") / 8)).alias("by_hi"),
        )
    )
    probes = (
        bands.select(
            lit("x_band").alias("probe_kind"),
            "i",
            col("bx_lo").alias("x_lo"),
            col("bx_hi").alias("x_hi"),
            lit(0).alias("y_lo"),
            unbounded.alias("y_hi"),
        )
        .unionByName(
            bands.select(
                lit("y_band").alias("probe_kind"),
                "i",
                lit(0).alias("x_lo"),
                unbounded.alias("x_hi"),
                col("by_lo").alias("y_lo"),
                col("by_hi").alias("y_hi"),
            )
        )
        .unionByName(
            bands.select(
                lit("xy_box").alias("probe_kind"),
                "i",
                col("bx_lo").alias("x_lo"),
                col("bx_hi").alias("x_hi"),
                col("by_lo").alias("y_lo"),
                col("by_hi").alias("y_hi"),
            )
        )
    )
    hit = ~(
        (col("min_x") > col("x_hi"))
        | (col("max_x") < col("x_lo"))
        | (col("min_y") > col("y_hi"))
        | (col("max_y") < col("y_lo"))
    )
    per_probe = (
        probes.crossJoin(stats)
        .groupBy("layout", "probe_kind", "i")
        .agg(F.sum(hit.cast("long")).alias("n_scanned"))
    )
    return (
        per_probe.groupBy("layout", "probe_kind")
        .agg(
            F.count("*").alias("n_probes"),
            F.floor(F.avg("n_scanned")).cast("long").alias("avg_files_scanned"),
            F.min("n_scanned").alias("min_files_scanned"),
            F.max("n_scanned").alias("max_files_scanned"),
        )
        .orderBy("layout", "probe_kind")
    )


def q153_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two versions of the events table
    (added / removed / changed row counts per event_type) — the validation
    pass after any MERGE/CDC apply (q87/q88), and the anti-entropy check
    between replicas. Version A drops event_id % 10 == 9; version B
    perturbs the value of every user_id % 100 == 0 row — so all three
    classes are non-empty by construction.

    Scale: ONE full-outer join on the key; the invariant columns compare
    through a map-side md5 over INTEGER renderings (micros + ids — floats
    and timestamps never stringify, the two engines render those
    differently), the mutable metric compares numerically. Comparing a
    hash instead of N columns keeps diff cost independent of width."""
    ev = load(spark, sf_dir, "events")
    h = F.md5(F.concat_ws("|", F.unix_micros(col("ts")), col("user_id")))
    a = ev.where(~(col("event_id") % 10 == 9)).select(
        "event_id", "event_type", h.alias("h_a"), col("value").alias("v_a")
    )
    b = ev.select(
        "event_id",
        col("event_type").alias("event_type_b"),
        h.alias("h_b"),
        F.when(col("user_id") % 100 == 0, col("value") + 1.0)
        .otherwise(col("value"))
        .alias("v_b"),
    )
    j = a.join(b, "event_id", "full_outer")
    return (
        j.select(
            F.coalesce("event_type", "event_type_b").alias("event_type"),
            F.isnull("h_a").cast("long").alias("added"),
            F.isnull("h_b").cast("long").alias("removed"),
            (
                col("h_a").isNotNull()
                & col("h_b").isNotNull()
                & ((col("h_a") != col("h_b")) | (col("v_a") != col("v_b")))
            )
            .cast("long")
            .alias("changed"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("added").alias("n_added"),
            F.sum("removed").alias("n_removed"),
            F.sum("changed").alias("n_changed"),
        )
        .orderBy("event_type")
    )


_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def q154_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every declared FK edge: child
    rows whose key has no parent (left-anti join per edge) — the
    constraint check a lakehouse runs because parquet enforces nothing.
    One row per edge: child rows, orphan rows, distinct orphan keys.

    Scale: each edge is an anti-join on its key — broadcast when the
    parent is a dim, shuffle otherwise (AQE decides); edges are
    independent jobs, so a scheduler runs them concurrently."""
    parts = []
    for child, ck, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent).select(pk)
        orphans = c.join(p, c[ck] == p[pk], "left_anti")
        parts.append(
            c.agg(F.count("*").alias("child_rows"))
            .crossJoin(
                orphans.agg(
                    F.count("*").alias("orphan_rows"),
                    F.countDistinct(ck).alias("orphan_keys"),
                )
            )
            .select(
                lit(f"{child}.{ck}->{parent}.{pk}").alias("fk_edge"),
                "child_rows",
                "orphan_rows",
                "orphan_keys",
            )
        )
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out.orderBy("fk_edge")


def _fk_audit_sql() -> str:
    parts = [
        f"""SELECT '{child}.{ck}->{parent}.{pk}' AS fk_edge,
       (SELECT COUNT(*) FROM {child}) AS child_rows,
       COUNT(*) AS orphan_rows,
       COUNT(DISTINCT x.{ck}) AS orphan_keys
FROM (SELECT {ck} FROM {child}
      WHERE {ck} NOT IN (SELECT {pk} FROM {parent})) x"""
        for child, ck, parent, pk in _FK_EDGES
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY fk_edge"


_LAYOUT_CTE = """src AS (
  SELECT l_partkey AS x, l_suppkey AS y, l_orderkey, l_linenumber FROM lineitem),
bx AS (
  SELECT x, y,
         ntile(32) OVER (ORDER BY x, l_orderkey, l_linenumber) - 1 AS px,
         ntile(32) OVER (ORDER BY y, l_orderkey, l_linenumber) - 1 AS py
  FROM src),
z AS (
  SELECT x, y,
         ((px >> 0) & 1) * 1    + ((py >> 0) & 1) * 2
       + ((px >> 1) & 1) * 4    + ((py >> 1) & 1) * 8
       + ((px >> 2) & 1) * 16   + ((py >> 2) & 1) * 32
       + ((px >> 3) & 1) * 64   + ((py >> 3) & 1) * 128
       + ((px >> 4) & 1) * 256  + ((py >> 4) & 1) * 512 AS zval
  FROM bx),
zf AS (SELECT zval >> 4 AS file_id, x, y FROM z),
lf AS (SELECT ntile(64) OVER (ORDER BY x, l_orderkey, l_linenumber) - 1 AS file_id,
              x, y FROM src)"""

_PRUNE_SCAN_SQL = """
  SELECT '{name}' AS layout, probe_kind, CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(FLOOR(AVG(n_scanned)) AS BIGINT) AS avg_files_scanned,
         MIN(n_scanned) AS min_files_scanned,
         MAX(n_scanned) AS max_files_scanned
  FROM (
    SELECT p.probe_kind, p.i,
           CAST(SUM(CASE WHEN NOT (s.min_x > p.x_hi OR s.max_x < p.x_lo
                               OR s.min_y > p.y_hi OR s.max_y < p.y_lo)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned
    FROM probes p CROSS JOIN {stats} s GROUP BY p.probe_kind, p.i)
  GROUP BY probe_kind"""


ORACLES = {
    "q159_zorder_layout": f"""
WITH {_LAYOUT_CTE},
zs AS (SELECT file_id, MAX(x) - MIN(x) AS sx, MAX(y) - MIN(y) AS sy
       FROM zf GROUP BY 1),
ls AS (SELECT file_id, MAX(x) - MIN(x) AS sx, MAX(y) - MIN(y) AS sy
       FROM lf GROUP BY 1)
SELECT 'zorder' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(FLOOR(AVG(sx)) AS BIGINT) AS avg_span_x,
       CAST(FLOOR(AVG(sy)) AS BIGINT) AS avg_span_y FROM zs
UNION ALL
SELECT 'linear', CAST(COUNT(*) AS BIGINT),
       CAST(FLOOR(AVG(sx)) AS BIGINT), CAST(FLOOR(AVG(sy)) AS BIGINT) FROM ls
ORDER BY layout
""",
    "q161_zorder_pruning": f"""
WITH {_LAYOUT_CTE},
zstats AS (SELECT file_id, MIN(x) AS min_x, MAX(x) AS max_x,
                  MIN(y) AS min_y, MAX(y) AS max_y FROM zf GROUP BY 1),
lstats AS (SELECT file_id, MIN(x) AS min_x, MAX(x) AS max_x,
                  MIN(y) AS min_y, MAX(y) AS max_y FROM lf GROUP BY 1),
g AS (SELECT MAX(max_x) AS gx, MAX(max_y) AS gy FROM zstats),
bands AS (
  SELECT t.i,
         (2 * t.i) * CAST(FLOOR(g.gx / 8) AS BIGINT) + 1 AS bx_lo,
         (2 * t.i) * CAST(FLOOR(g.gx / 8) AS BIGINT) + 1
           + CAST(FLOOR(g.gx / 8) AS BIGINT) AS bx_hi,
         (2 * t.i) * CAST(FLOOR(g.gy / 8) AS BIGINT) + 1 AS by_lo,
         (2 * t.i) * CAST(FLOOR(g.gy / 8) AS BIGINT) + 1
           + CAST(FLOOR(g.gy / 8) AS BIGINT) AS by_hi
  FROM range(4) t(i) CROSS JOIN g),
probes AS (
  SELECT 'x_band' AS probe_kind, i, bx_lo AS x_lo, bx_hi AS x_hi,
         CAST(0 AS BIGINT) AS y_lo, CAST(4611686018427387904 AS BIGINT) AS y_hi
  FROM bands
  UNION ALL
  SELECT 'y_band', i, CAST(0 AS BIGINT), CAST(4611686018427387904 AS BIGINT),
         by_lo, by_hi
  FROM bands
  UNION ALL
  SELECT 'xy_box', i, bx_lo, bx_hi, by_lo, by_hi FROM bands)
{_PRUNE_SCAN_SQL.format(name='zorder', stats='zstats')}
UNION ALL
{_PRUNE_SCAN_SQL.format(name='linear', stats='lstats')}
ORDER BY layout, probe_kind
""",
    "q153_snapshot_diff": """
WITH a AS (
  SELECT event_id, event_type,
         md5(CAST(ts AS VARCHAR) || '|' || user_id || '|' || value) AS h_a
  FROM events WHERE event_id % 10 <> 9),
b AS (
  SELECT event_id, event_type AS event_type_b,
         md5(CAST(ts AS VARCHAR) || '|' || user_id || '|' ||
             CASE WHEN user_id % 100 = 0 THEN value + 1.0 ELSE value END) AS h_b
  FROM events),
j AS (SELECT COALESCE(a.event_type, b.event_type_b) AS event_type,
             a.h_a, b.h_b
      FROM a FULL OUTER JOIN b USING (event_id))
SELECT event_type,
       CAST(SUM(CASE WHEN h_a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN h_b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN h_a IS NOT NULL AND h_b IS NOT NULL
                      AND h_a <> h_b THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
FROM j GROUP BY event_type ORDER BY event_type
""",
    "q154_fk_audit": _fk_audit_sql(),
    "q93_salted_join": """
SELECT p_brand, COUNT(*) AS cnt, CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10
GROUP BY 1 ORDER BY 1
""",
    "q87_merge_upsert": """
WITH target AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders),
source AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'I', o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0),
merged AS (
  SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
         COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
         COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
         COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
         COALESCE(s.o_orderdate, t.o_orderdate) AS o_orderdate,
         COALESCE(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority
  FROM target t FULL OUTER JOIN source s USING (o_orderkey))
SELECT o_orderstatus, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
FROM merged GROUP BY 1 ORDER BY 1
""",
    # Same relational merge as q87 — here the Spark side additionally went
    # through the copy-on-write file path (staged write + partition swap)
    # and read the snapshot back, so the oracle checks the WRITTEN table.
    "q87b_merge_cow": """
WITH target AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders),
source AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'I', o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0),
merged AS (
  SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
         COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
         COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
         COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
         COALESCE(s.o_orderdate, t.o_orderdate) AS o_orderdate,
         COALESCE(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority
  FROM target t FULL OUTER JOIN source s USING (o_orderkey))
SELECT o_orderstatus, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS sum_price
FROM merged GROUP BY 1 ORDER BY 1
""",
    "q88_latest_per_key": """
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1 ORDER BY user_id
""",
    "q106_partitioned_export": f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CAST({hash48_sql('text')} AS DECIMAL(38,0))) AS VARCHAR) AS text_sum
FROM documents GROUP BY 1 ORDER BY 1
""",
}

QUERIES = {
    "q153_snapshot_diff": q153_snapshot_diff,
    "q154_fk_audit": q154_fk_audit,
    "q159_zorder_layout": q159_zorder_layout,
    "q161_zorder_pruning": q161_zorder_pruning,
    "q87_merge_upsert": q87_merge_upsert,
    "q87b_merge_cow": q87b_merge_cow,
    "q88_latest_per_key": q88_latest_per_key,
    "q93_salted_join": q93_salted_join,
    "q106_partitioned_export": q106_partitioned_export,
}
