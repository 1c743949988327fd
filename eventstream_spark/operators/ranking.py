"""Scalable global ranking: row_number / ntile over a TOTAL order without
a single-task window.

A bare ``Window.orderBy(...)`` (no partitionBy) moves every row into ONE
task — correct to ~1e8 rows on a fat executor and a wall at any real
scale. The classic fix, implemented here: range-partition on the ordering
key, rank WITHIN partitions, and add each partition's exclusive prefix
count (a <=num_partitions-row collect — driver-trivial). Because the
ordering must be TOTAL (callers append a unique tie-break column), the
result is identical to the single-task form no matter where the range
boundaries land, so the same duckdb oracles keep passing unchanged.

``scalable_ntile`` reproduces Spark/ANSI NTILE(k) exactly from the global
rank: the first (n mod k) buckets take ceil(n/k) rows, the rest floor —
pinned equal to F.ntile in tests/test_ranking.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import col, lit

from ..cache import persist_tracked


def _ranked_with_total(
    df: DataFrame, order_cols: list, out_col: str
) -> tuple[DataFrame, int]:
    """(ranked df, total rows): 1-based global rank over a TOTAL order
    (order_cols must be tie-free — include a unique key) via range
    partitioning + an exclusive prefix-count offset. The per-partition
    count collect (<= shuffle-partitions rows) also yields the total for
    free.

    Cost: one range exchange (same as any global sort) + a per-partition
    window + the tiny collect. At 100 TB this is the plan a sort already
    pays; the single-task form is the one that cannot run. The
    range-partitioned intermediate persists (memory-and-disk) because the
    count collect below materializes it anyway — without the persist every
    downstream consumer would re-pay the exchange AND the range-boundary
    sampling job."""
    rp = persist_tracked(
        df.repartitionByRange(*order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in rp.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    off = F.coalesce(
        *[F.when(col("_pid") == p, lit(o)) for p, o in offsets.items()], lit(0)
    )
    ranked = rp.withColumn(out_col, (F.row_number().over(w) + off).cast("long")).drop(
        "_pid"
    )
    return ranked, acc


def exact_value_at_ranks(
    df: DataFrame,
    value_col: str,
    ranks_fn,
    n_buckets: int = 1024,
    what: str = "table",
) -> tuple[int, dict]:
    """(n, {rank: value}): the exact VALUES at a handful of 1-based global
    ranks of the ``value_col``-sorted order — WITHOUT a global rank
    exchange. Because ties are equal values, the value at a fixed rank is
    independent of any tie-break, so only the value ordering matters.

    Single-pass bucketed rank-pick (the round-7 VERDICT A/B ask): one agg
    for (n, min, max), one map-side-combined histogram over ``n_buckets``
    equi-width value buckets (floor((v-lo)/w) is monotone in v, so bucket
    order IS value order), a driver cumsum locating each target rank's
    (bucket, local_rank), then one scan filtered to the <=|ranks| target
    buckets with a window over ONLY those rows. No full-table shuffle at
    any step; the histogram collect is n_buckets rows. A
    single-value-dominated bucket makes the last window skewed — real
    engines recurse; at n_buckets=1024 one level suffices for every
    measured fixture and the filter bound is ~|ranks|/n_buckets of the
    table.

    A/B vs the global_row_number spelling (scripts/ab_rank_pick.py,
    sf0.1 lineitem ~600k rows, median of 3 steady, this host): bucketed
    1.16 s vs rank-exchange 1.90 s, values asserted equal — adopted; the
    rank exchange (q210's former plan) is the recorded loser. Empty input
    fails LOUD (ValueError naming ``what``) — the embedding_dim
    convention."""
    stats = df.agg(
        F.count("*").alias("n"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    ).head()
    n = int(stats["n"])
    if n == 0:
        raise ValueError(
            f"{what} is empty — cannot pick exact rank values "
            "(streaming landing dir not yet populated?)"
        )
    ranks = sorted(set(int(r) for r in ranks_fn(n)))
    if any(r < 1 or r > n for r in ranks):
        raise ValueError(f"rank out of range 1..{n}: {ranks}")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    if lo == hi:
        return n, {r: stats["lo"] for r in ranks}
    width = (hi - lo) / n_buckets
    bexpr = F.least(
        F.floor((col(value_col).cast("double") - lit(lo)) / lit(width)),
        lit(n_buckets - 1),
    ).cast("int")
    hist = sorted(
        (r["b"], r["cnt"])
        for r in df.groupBy(bexpr.alias("b")).agg(F.count("*").alias("cnt")).collect()
    )
    targets: dict[int, list[tuple[int, int]]] = {}
    acc = 0
    it = iter(ranks)
    rank = next(it)
    for b, cnt in hist:
        while rank is not None and rank <= acc + cnt:
            targets.setdefault(b, []).append((rank, rank - acc))
            rank = next(it, None)
        acc += cnt
        if rank is None:
            break
    want = [(b, lr) for b, pairs in targets.items() for _, lr in pairs]
    w = Window.partitionBy("_b").orderBy(value_col)
    pick_cond = None
    for b, lr in want:
        term = (col("_b") == lit(b)) & (col("_lr") == lit(lr))
        pick_cond = term if pick_cond is None else (pick_cond | term)
    rows = (
        df.select(value_col)
        .withColumn("_b", bexpr)
        .where(col("_b").isin(*targets.keys()))
        .withColumn("_lr", F.row_number().over(w))
        .where(pick_cond)
        .select("_b", "_lr", value_col)
        .collect()
    )
    by_blr = {(r["_b"], r["_lr"]): r[value_col] for r in rows}
    return n, {
        rank: by_blr[(b, lr)] for b, pairs in targets.items() for rank, lr in pairs
    }


def global_row_number(
    df: DataFrame, order_cols: list, out_col: str = "_rank"
) -> DataFrame:
    """Append a 1-based global rank with no single-task window (see
    _ranked_with_total)."""
    ranked, _ = _ranked_with_total(df, order_cols, out_col)
    return ranked


def ntile_from_rank(rank: F.Column, n: int, k: int) -> F.Column:
    """ANSI NTILE(k) bucket from a 1-based global rank over n rows: the
    first (n mod k) buckets hold ceil(n/k) rows, the remainder floor(n/k).
    Pure integer arithmetic — deterministic everywhere."""
    q, rem = divmod(n, k)
    boundary = rem * (q + 1)
    if q == 0:
        # fewer rows than buckets: rank IS the bucket
        return rank.cast("int")
    return (
        F.when(rank <= lit(boundary), F.floor((rank - 1) / lit(q + 1)) + 1)
        .otherwise(lit(rem) + F.floor((rank - 1 - lit(boundary)) / lit(q)) + 1)
        .cast("int")
    )


def scalable_ntile(
    df: DataFrame, order_cols: list, k: int, out_col: str
) -> DataFrame:
    """NTILE(k) over a total order with no single-task window: global rank
    via range partitioning, then the closed-form bucket assignment."""
    ranked, n = _ranked_with_total(df, order_cols, "_gr")
    return ranked.withColumn(out_col, ntile_from_rank(col("_gr"), n, k)).drop("_gr")


def scalable_ntile_multi(
    df: DataFrame, tie_col: str, specs: list, k: int
) -> DataFrame:
    """Several NTILE(k) columns over DIFFERENT total orders of the SAME
    rows with ONE range exchange (three separate scalable_ntile calls pay
    three): melt each row into len(specs) (metric, sortval) rows, rank the
    melted table once — the metric index leads the range key, so each
    metric's block is contiguous and its within-metric rank is the global
    rank minus metric_index·n — then pivot back on the unique tie-break.

    ``specs`` is ``[(out_col, ascending_sort_col), ...]``; descending
    metrics pass a negated column. Sort values are cast to double (exact
    for ints < 2^53; monotone, so bucket boundaries are unchanged). All
    other input columns are carried through the pivot via max() — they are
    constant per tie_col row by construction."""
    base_cols = df.columns
    melted = df.select(
        *base_cols,
        F.posexplode(
            F.array(*[s.cast("double") for _, s in specs])
        ).alias("_m", "_v"),
    )
    ranked, total = _ranked_with_total(
        melted, [col("_m").asc(), col("_v").asc(), col(tie_col).asc()], "_gr"
    )
    n = total // len(specs)
    tiled = ranked.withColumn(
        "_tile", ntile_from_rank(col("_gr") - col("_m") * lit(n), n, k)
    )
    carry = [F.max(c).alias(c) for c in base_cols if c != tie_col]
    tiles = [
        F.max(F.when(col("_m") == i, col("_tile"))).alias(out)
        for i, (out, _) in enumerate(specs)
    ]
    return tiled.groupBy(tie_col).agg(*carry, *tiles)
