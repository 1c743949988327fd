"""Generate an ALTERNATE deterministic fixture set for differential
robustness runs.

The driver's tables (/root/testdata/sf*, seed=42) are the official gate
inputs — but any query whose Spark side and duckdb oracle both bake in the
same fixture-derived literal (the q186 bug class: a mirrored `64` for the
embedding dim) will agree on that one dataset *by construction*. This
script materializes a second dataset with the SAME schemas and value
domains but a different seed, different table sizes, and a different
embedding dimensionality, so running the full differential suite against
it surfaces exactly that class of silent agreement:

    python scripts/gen_fixtures.py testdata_alt/sf0.01b --seed 777
    python scripts/check_correctness.py /root/repo/testdata_alt/sf0.01b

Everything here mimics the driver generator's *shape* (schemas verified
from the sf0.01 parquet footers, domains from FIXTURES.md): TPC-H-ish star
schema + events stream + documents/embeddings. It deliberately does NOT
mimic the driver's exact distributions — different sizes, a different date
window for events, near-duplicate documents injected on purpose (the
driver's 500 docs are all distinct; near-dups exercise the dedup family's
non-trivial paths), and embedding dim 48 instead of 64.

Deterministic: one numpy Generator seeded from --seed drives everything;
same invocation → byte-identical parquet.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
ADJS = ["red", "blue", "hot", "small", "green", "cold", "big", "dark"]
NOUNS = ["widget", "gear", "bolt", "ring", "gizmo", "cog", "spring"]
# the driver documents' 31-word vocabulary (verified from sf0.01)
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_us(col: np.ndarray) -> pa.Array:
    return pa.array(col.astype("int64"), type=pa.int64()).cast(pa.timestamp("us"))


def generate(out_dir: str, seed: int, n_customer: int, n_supplier: int,
             n_part: int, n_orders: int, n_events: int, n_docs: int,
             n_vecs: int, emb_dim: int) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_customer), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_customer)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_customer), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_customer), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_customer)],
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supplier), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supplier)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supplier), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supplier), 2),
    }))

    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{ADJS[int(a)]} {NOUNS[int(b)]}"
                   for a, b in zip(rng.integers(0, len(ADJS), n_part),
                                   rng.integers(0, len(NOUNS), n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 999.9, n_part), 1),
    }))

    # orders: dates uniform over 1995-01-01 .. 2001-08-01 (the driver's
    # window — TPC-H-shaped queries filter on literals inside it)
    d0 = np.datetime64("1995-01-01", "us").astype("int64")
    d1 = np.datetime64("2001-08-01", "us").astype("int64")
    odate_days = rng.integers(0, (d1 - d0) // DAY_US + 1, n_orders)
    odate = d0 + odate_days * DAY_US
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_customer, n_orders), pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, n_orders)],
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_orders), 2),
        "o_orderdate": _ts_us(odate),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_orders)],
    }))

    # lineitem: 1..7 lines per order, shipdate = orderdate + 1..95 days
    lines_per = rng.integers(1, 8, n_orders)
    okey = np.repeat(np.arange(n_orders, dtype="int64"), lines_per)
    n_li = int(lines_per.sum())
    linenum = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    ship = odate.repeat(lines_per) + rng.integers(1, 96, n_li) * DAY_US
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supplier, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [RETURNFLAGS[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [LINESTATUSES[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(ship),
    }))

    # events: a DIFFERENT month than the driver's (2024-03 vs 2024-01);
    # value lognormal-ish clipped to the driver's [0.01, 490] envelope
    e0 = np.datetime64("2024-03-01", "us").astype("int64")
    span = 30 * DAY_US
    ets = np.sort(e0 + rng.integers(0, span, n_events))
    value = np.round(np.clip(rng.lognormal(3.5, 1.0, n_events), 0.01, 490.0), 2)
    props = [json.dumps({"k": int(k)}) for k in rng.integers(0, 120, n_events)]
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": _ts_us(ets),
        "user_id": pa.array(rng.integers(0, 250, n_events), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_events)],
        "value": value,
        "props": props,
    }))

    # documents: Zipf-weighted words from the driver vocabulary; ~10% of
    # docs are near-duplicate mutations of an earlier doc and ~2% exact
    # duplicates, so the dedup family computes over non-trivial structure
    w = 1.0 / np.arange(1, len(VOCAB) + 1) ** 0.8
    w /= w.sum()
    perm = rng.permutation(len(VOCAB))
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.02:
            texts.append(texts[int(rng.integers(0, i))])  # exact dup
        elif i > 10 and r < 0.12:
            base = texts[int(rng.integers(0, i))].split()  # near dup
            for _ in range(int(rng.integers(1, 4))):
                base[int(rng.integers(0, len(base)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(base))
        else:
            n_words = int(rng.integers(8, 100))
            idx = rng.choice(perm, size=n_words, p=w)
            texts.append(" ".join(VOCAB[int(j)] for j in idx))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, n_docs)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm float32, weak label tilt (the driver's cluster
    # structure: centers ~0.14 apart at unit vector norm) — and a DIFFERENT
    # dimensionality, the q186-class probe
    labels = rng.integers(0, 10, n_vecs)
    centers = rng.normal(0.0, 0.02, size=(10, emb_dim))
    vecs = rng.normal(0.0, 1.0, size=(n_vecs, emb_dim)) * 0.15 + centers[labels]
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs32 = vecs.astype("float32")
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs32.ravel(), pa.float32()), emb_dim
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--customer", type=int, default=2100)
    ap.add_argument("--supplier", type=int, default=130)
    ap.add_argument("--part", type=int, default=2600)
    ap.add_argument("--orders", type=int, default=19000)
    ap.add_argument("--events", type=int, default=13000)
    ap.add_argument("--docs", type=int, default=650)
    ap.add_argument("--vecs", type=int, default=650)
    ap.add_argument("--dim", type=int, default=48)
    a = ap.parse_args()
    generate(a.out_dir, a.seed, a.customer, a.supplier, a.part, a.orders,
             a.events, a.docs, a.vecs, a.dim)
    print(f"wrote {a.out_dir} (seed={a.seed}, dim={a.dim})")


if __name__ == "__main__":
    sys.exit(main())
