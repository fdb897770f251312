"""Alternate-seed fixture generator (r6 judge #5): regenerates the
driver's sf0.01-shaped synthetic tables with a DIFFERENT seed so the
full differential sweep can prove no oracle is overfit to seed=42
fixture quirks (a value pattern that never ties, a collision that never
happens). Schemas, row counts, domains, and statistical shape mirror
/root/testdata/sf0.01 (inspected, not copied); values differ.

Usage: python tools/gen_testdata.py [seed] [out_dir]
  default seed 7, out_dir /tmp/testdata_seed{seed}/sf0.01

Then: python tools/check.py /tmp/testdata_seed7/sf0.01
(check.py stamps EVIDENCE only for /root/testdata paths, so
alternate-seed passes never masquerade as driver-fixture evidence).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_ROWS = {
    "region": 5, "nation": 25, "customer": 1500, "supplier": 100,
    "part": 2000, "orders": 15000, "lineitem": 60000, "events": 10000,
    "documents": 500, "embeddings": 500,
}

VOCAB = (
    "key agg row scan slow fast table value part hash a the b big small "
    "merge join filter column window batch spark order data line customer "
    "query stream group vector"
).split()

MKTSEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO", "ECONOMY"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
PCOLORS = ["small", "red", "blue", "green", "large", "shiny", "dull", "old"]
PNOUNS = ["ring", "widget", "bolt", "gear", "cog", "pin", "cap", "rod"]


def _ts_us(values) -> pa.Array:
    return pa.array(values, type=pa.timestamp("us"))


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/testdata_seed{seed}/sf0.01"
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    def w(name: str, table: pa.Table) -> None:
        assert len(table) == SF_ROWS[name], (name, len(table))
        pq.write_table(table, f"{out}/{name}.parquet")

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(rng.integers(0, 5, 25), pa.int32()),
    }))

    n = SF_ROWS["customer"]
    w("customer", pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n)],
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n), 2),
        "c_mktsegment": [MKTSEG[i] for i in rng.integers(0, 5, n)],
    }))

    n = SF_ROWS["supplier"]
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(n), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n)],
        "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10000, n), 2),
    }))

    n = SF_ROWS["part"]
    w("part", pa.table({
        "p_partkey": pa.array(range(n), pa.int64()),
        "p_name": [
            f"{PCOLORS[a]} {PNOUNS[b]}"
            for a, b in zip(rng.integers(0, 8, n), rng.integers(0, 8, n))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, n)],
        "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n) * 0.1, 2),
    }))

    n = SF_ROWS["orders"]
    base = dt.datetime(1995, 1, 1)
    odays = rng.integers(0, 2405, n)
    w("orders", pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_custkey": pa.array(
            rng.integers(0, SF_ROWS["customer"], n), pa.int64()
        ),
        "o_orderstatus": [("O", "F", "P")[i] for i in rng.integers(0, 3, n)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n), 2),
        "o_orderdate": _ts_us([base + dt.timedelta(days=int(d)) for d in odays]),
        "o_orderpriority": [PRIOS[i] for i in rng.integers(0, 5, n)],
    }))

    n = SF_ROWS["lineitem"]
    lok = np.sort(rng.integers(0, SF_ROWS["orders"], n))
    # linenumber = 1..k within each order (orders sorted, so cumcount)
    ln = np.ones(n, dtype=np.int64)
    for i in range(1, n):
        ln[i] = ln[i - 1] + 1 if lok[i] == lok[i - 1] else 1
    ship = rng.integers(1, 2500, n)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, SF_ROWS["part"], n), pa.int64()),
        "l_suppkey": pa.array(
            rng.integers(0, SF_ROWS["supplier"], n), pa.int64()
        ),
        "l_linenumber": pa.array(np.minimum(ln, 7), pa.int32()),
        "l_quantity": rng.integers(1, 51, n).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n), 2),
        "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
        "l_returnflag": [("A", "N", "R")[i] for i in rng.integers(0, 3, n)],
        "l_linestatus": [("O", "F")[i] for i in rng.integers(0, 2, n)],
        "l_shipdate": _ts_us([base + dt.timedelta(days=int(d)) for d in ship]),
    }))

    n = SF_ROWS["events"]
    t0 = dt.datetime(2024, 1, 1)
    secs = np.sort(rng.uniform(0, 30 * 86400, n))
    w("events", pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": _ts_us([t0 + dt.timedelta(seconds=float(s)) for s in secs]),
        "user_id": pa.array(rng.integers(0, 150, n), pa.int64()),
        "event_type": [ETYPES[i] for i in rng.integers(0, 5, n)],
        "value": np.round(rng.uniform(0.01, 500.0, n), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)],
    }))

    n = SF_ROWS["documents"]
    texts = []
    for i in range(n):
        nw = int(rng.integers(10, 100))
        texts.append(" ".join(
            VOCAB[j] for j in rng.integers(0, len(VOCAB), nw)
        ))
    w("documents", pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": texts,
        "lang": [
            LANGS[i] for i in rng.choice(
                5, n, p=[0.44, 0.14, 0.14, 0.14, 0.14]
            )
        ],
        "source": [f"src{i % 20}" for i in range(n)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n = SF_ROWS["embeddings"]
    emb = rng.uniform(-0.53, 0.46, (n, 64)).astype(np.float32)
    w("embeddings", pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    }))

    print(f"seed={seed} -> {out} ({len(SF_ROWS)} tables)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
