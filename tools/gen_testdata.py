"""Deterministic synthetic-data generator for scale factors beyond the
driver-provided sf0.1 — same ten-table star schema, same column types, same
distribution families, seeded (numpy PCG64, seed=42) so every run is
byte-reproducible.

The driver ships read-only parquet at sf{0.001,0.01,0.1}
(/root/testdata, TESTDATA.md). Scale-evidence runs (VERDICT r3 "Next
round" #1) need sf1.0: this script synthesises it OUTSIDE /root/testdata
(default /root/repo/data/sf1.0) with the distributions profiled from the
sf0.1 tables:

- region/nation: fixed 5 / 25 rows, same names.
- customer/supplier/part/orders/lineitem: TPC-H-ish; FK containment holds
  (l_orderkey ⊆ orders, o_custkey ⊆ customer, ...); 1..7 lineitems/order;
  o_orderdate ∈ [1995-01-01, 2001-08-01], l_shipdate = o_orderdate + 1..120d.
- events: serial event_id, ts ascending from 2024-01-01 over a FIXED ~30-day
  span (event density scales, per-user cadence ~11 h stays — window-operator
  row counts then scale linearly, matching the driver's recipe), 5 event
  types, value lognormal (median ~35, mean ~50), props = {"k": 0..99}.
- documents: 31-word vocabulary sentences of 10..100 words; ~12% of docs are
  MUTATED COPIES of an earlier base doc (5-15% of words resampled) and
  ~0.2% are exact copies — the near-dup/exact-dup structure the dedup fleet
  measures; langs en~41%/zh/es/fr/de, sources src0..src19.
- embeddings: 64-dim unit-normalized gaussian vectors, labels 0..9 uniform
  (the sf0.1 table has no cluster/near-dup structure; gates augment their
  own corpora).

Row counts scale linearly vs sf0.1: sf1.0 = 10x rows of every scaled table.

Usage:  python tools/gen_testdata.py [sf] [outdir]
        python tools/gen_testdata.py 1.0 /root/repo/data/sf1.0
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window".split()
)
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
EVENT_TYPES = np.array(["signup", "purchase", "view", "click", "error"])
REGIONS = ["EUROPE", "AFRICA", "AMERICA", "ASIA", "MIDDLE EAST"]
SEGMENTS = np.array(
    ["MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "BUILDING"]
)
PRIORITIES = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
PTYPES = np.array(
    ["ECONOMY", "SMALL", "PROMO", "LARGE", "STANDARD", "MEDIUM"]
)
PNOUNS = ["widget", "ring", "gear", "gizmo", "anvil", "bolt", "plate", "rod"]
PADJS = ["large", "hot", "blue", "red", "green", "small", "cold", "dark"]

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")
DAY_US = 86_400_000_000


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen(sf: float, outdir: str, seed: int = 42) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    s = sf / 0.1  # scale relative to the profiled sf0.1 tables

    # -- region / nation (fixed small dims) -------------------------------
    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # -- customer / supplier / part ---------------------------------------
    n_cust = int(15000 * s)
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_cust), 2),
        "c_mktsegment": SEGMENTS[rng.integers(0, 5, n_cust)],
    }))
    n_supp = int(1000 * s)
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_supp), 2),
    }))
    n_part = int(20000 * s)
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{PADJS[i % 8]} {PNOUNS[(i // 8) % 8]}" for i in range(n_part)
        ],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(0, 25, n_part)],
        "p_type": PTYPES[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) * 0.1, 2),
    }))

    # -- orders / lineitem ------------------------------------------------
    n_ord = int(150000 * s)
    span_days = 2404  # 1995-01-01 .. 2001-08-01
    odate_day = rng.integers(0, span_days + 1, n_ord)
    odate = (np.datetime64("1995-01-01T00:00:00", "us")
             + odate_day.astype("timedelta64[D]").astype("timedelta64[us]"))
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[
            rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])],
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": PRIORITIES[rng.integers(0, 5, n_ord)],
    }))
    lines_per = rng.integers(1, 8, n_ord)
    l_ok = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(l_ok)
    l_ln = (np.arange(n_li)
            - np.repeat(np.cumsum(lines_per) - lines_per, lines_per) + 1)
    shipdate = (odate[l_ok]
                + rng.integers(1, 121, n_li)
                .astype("timedelta64[D]").astype("timedelta64[us]"))
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_ln, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["R", "A", "N"])[
            rng.choice(3, n_li, p=[0.25, 0.25, 0.5])],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": shipdate,
    }))

    # -- events (the transcript substrate) --------------------------------
    # FIXED ~30-day span; density scales with sf so per-user cadence (~11 h)
    # is preserved and window-operator outputs scale linearly
    n_ev = int(100000 * s)
    n_users = int(1500 * s)
    span_us = 30 * DAY_US
    gaps = rng.exponential(span_us / n_ev, n_ev)
    ts_off = np.cumsum(gaps)
    ts_off *= (span_us - 1) / ts_off[-1]
    ev_ts = EPOCH_2024 + ts_off.astype(np.int64).astype("timedelta64[us]")
    value = np.round(
        np.clip(rng.lognormal(mean=3.55, sigma=0.85, size=n_ev), 0.01, 600.0),
        2)
    kprop = rng.integers(0, 100, n_ev)
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": ev_ts,
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": EVENT_TYPES[rng.integers(0, 5, n_ev)],
        "value": value,
        "props": [json.dumps({"k": int(k)}) for k in kprop],
    }))

    # -- documents (near-dup structure for the dedup fleet) ---------------
    n_doc = int(5000 * s)
    lengths = rng.integers(10, 101, n_doc)
    kind = rng.random(n_doc)  # <0.12 near-dup copy, <0.122 exact copy
    texts: list[str] = []
    words_store: list[np.ndarray] = []
    for i in range(n_doc):
        if i > 0 and kind[i] < 0.122:
            base = words_store[int(rng.integers(0, i))]
            if kind[i] < 0.12:  # mutate 5-15% of words
                w = base.copy()
                n_mut = max(1, int(len(w) * rng.uniform(0.05, 0.15)))
                idx = rng.choice(len(w), n_mut, replace=False)
                w[idx] = VOCAB[rng.integers(0, len(VOCAB), n_mut)]
            else:  # exact duplicate
                w = base
        else:
            w = VOCAB[rng.integers(0, len(VOCAB), lengths[i])]
        words_store.append(w)
        texts.append(" ".join(w))
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": LANGS[rng.choice(5, n_doc, p=LANG_P)],
        "source": np.array([f"src{i}" for i in range(20)])[
            rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # -- embeddings (random unit vectors, like the driver's table) --------
    n_vec = int(2000 * s)
    M = rng.standard_normal((n_vec, 64)).astype(np.float32)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(M), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (sys.argv[2] if len(sys.argv) > 2
           else f"/root/repo/data/sf{sf:g}")
    print(f"generating sf={sf} -> {out}")
    gen(sf, out)
    print("done")
