#!/usr/bin/env python3
"""Generate a schema-faithful synthetic testdata directory at an
arbitrary scale factor (default sf1 = 10x the shipped sf0.1), for
parity sweeps beyond the driver-shipped SFs.

Dev-only tool (driver-side python is allowed for validation only).
The distributions mirror the shipped testdata's observed domains:
same schemas, same physical parquet types (events = TIMESTAMP NANOS,
orders/lineitem = ms), same value vocabularies, a comparable exact-dup
rate in documents, and unit-norm 10-cluster embeddings. Parity at sf1
checks Spark-vs-DuckDB SELF-consistency at 10x the judge's gate — it
does not need to reproduce the driver's exact rows.

Usage: python3 tools/gen_sf.py /tmp/testdata/sf1 10
       (second arg = multiplier over the sf0.1 row counts)
       python3 tools/gen_sf.py /tmp/testdata/aniso 10 --aniso
       (embeddings get a decaying axis-aligned spectrum exp(-d/8) —
       the real-text-embedding anisotropy the shipped isotropic corpus
       lacks; the OPQ recall proof runs RecallSweep `opq` against this)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("batch part spark line column order small sort fast value scan hash "
         "slow group agg filter query big key window row table stream merge "
         "data vector a").split()
LANGS = [("en", 0.8), ("zh", 0.05), ("de", 0.05), ("fr", 0.05), ("es", 0.05)]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"]
ADJS = ["large", "hot", "blue", "red", "small", "dark", "light", "cold"]
NOUNS = ["ring", "bolt", "case", "drum", "tube", "disk", "cap", "rod"]


def write(out, name, table, row_group_size=None):
    # Multi-row-group layout (r16): a single-row-group file scans in ONE
    # Spark task no matter what maxPartitionBytes says (a row group is
    # read whole by the byte-range split owning its midpoint) — the r15
    # sf1 bench ran ~210 s of its 600 s wall on 1 of 32 cores from
    # exactly this. Size groups so every generated corpus plans >= a
    # 32-core machine's worth of real splits.
    kw = {}
    if row_group_size is not None:
        kw["row_group_size"] = row_group_size
    pq.write_table(table, os.path.join(out, f"{name}.parquet"),
                   version="2.6", **kw)
    print(f"  {name}: {table.num_rows} rows "
          f"({pq.ParquetFile(os.path.join(out, f'{name}.parquet')).metadata.num_row_groups} row groups)")


def main(out: str, mult: int, aniso: bool = False) -> None:
    rng = np.random.default_rng(1)
    os.makedirs(out, exist_ok=True)
    n_cust, n_supp, n_part = 15000 * mult, 1000 * mult, 20000 * mult
    n_ord, n_ev = 150000 * mult, 100000 * mult
    n_doc, n_emb = 5000 * mult, 2000 * mult

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()), "r_name": REGIONS}))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))
    write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(1000, 500000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]}))
    write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(1000, 10000, n_supp), 2)}))
    write(out, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{ADJS[i % 8]} {NOUNS[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": [f"Brand#{1 + (i % 20)}" for i in range(n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 5, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900 + np.arange(n_part) * 0.1, 1)}))

    day_ms = 86400000
    o_epoch = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
    o_date_ms = o_epoch + rng.integers(0, 2404, n_ord) * day_ms
    write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(o_date_ms, pa.timestamp("ms")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]}),
        row_group_size=131072)

    lines_per = rng.integers(1, 8, n_ord)
    l_okey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_okey)
    l_lineno = np.concatenate([np.arange(1, k + 1) for k in lines_per]).astype(np.int32)
    ship_ms = np.repeat(o_date_ms, lines_per) + rng.integers(1, 96, n_li) * day_ms
    write(out, "lineitem", pa.table({
        "l_orderkey": l_okey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": pa.array(l_lineno, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(ship_ms, pa.timestamp("ms"))}),
        row_group_size=131072)

    ev_epoch = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
    ev_ns = ev_epoch + rng.integers(0, 30 * 86400 * 10**9, n_ev, dtype=np.int64)
    write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(np.sort(ev_ns), pa.timestamp("ns")),
        "user_id": rng.integers(0, n_cust, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(80, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}),
        row_group_size=65536)

    lang_names = [l for l, _ in LANGS]
    lang_p = [p for _, p in LANGS]
    n_toks = rng.integers(10, 101, n_doc)
    texts = [" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), k)])
             for k in n_toks]
    # exact-dup rate ~0.2%, mirroring the shipped corpus
    for i in rng.integers(n_doc // 2, n_doc, max(1, n_doc // 500)):
        texts[i] = texts[i - n_doc // 2]
    write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(lang_names)[rng.choice(len(LANGS), n_doc, p=lang_p)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)}),
        row_group_size=2048)

    # per-dim scale: isotropic by default; --aniso applies the decaying
    # spectrum to BOTH centers and noise so the whole corpus lives in a
    # low-effective-rank cone (what a trained text encoder emits)
    dim_scale = np.exp(-np.arange(64) / 8.0) if aniso else np.ones(64)
    centers = rng.standard_normal((10, 64)) * dim_scale
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + 0.25 * rng.standard_normal((n_emb, 64)) * dim_scale
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}),
        row_group_size=2048)


if __name__ == "__main__":
    main(sys.argv[1],
         int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 10,
         "--aniso" in sys.argv)
