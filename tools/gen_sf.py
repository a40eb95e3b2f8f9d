"""Synthesize a scale-factor directory following the driver's testdata law.

The driver generates /root/testdata/sf{0.001,0.01,0.1} (TESTDATA.md,
seed=42, read-only); round-5's scaling evidence needs sf1 — 10x the bench
scale, 100x the correctness-gate scale — which the driver does not ship.
This tool extrapolates the driver's own measured scaling law, column by
column, from the shipped directories (verified in-session against sf0.01
and sf0.1 with DuckDB):

  * region/nation: fixed 5/25 rows, names AFRICA.../NATION_i, region i%5.
  * customer/supplier/part/orders/lineitem/events: linear in sf
    (150k/10k/200k/1.5M/6M/1M rows per unit sf).
  * documents: 10x per decade at the top end (5,000 @ sf0.1 -> 50,000).
  * embeddings: 4x per decade (2,000 @ sf0.1 -> 8,000), 64-dim unit-norm.
  * fixed cardinalities: 20 sources (src{doc_id%20}, exact), 5 langs
    (en-heavy multinomial), 10 labels, 5 event types, 5 mktsegments,
    8x8 part-name vocabulary, 25 brands, 6 types,
    p_retailprice = 900 + (p_partkey%1000)/10 (exact driver formula).
  * lineitem.l_orderkey uniform over orders (Poisson(4) items/order,
    matching the driver's observed 1..17 distribution), shipdate
    independent of orderdate (driver's diff spans -2399..+2496 days).
  * events.value ~ Exponential(mean 50) (driver quantiles 14.6/34.8/68.9
    at p25/50/75), props = {"k": uniform 0..99}.

Deterministic (numpy PCG64 seed 42 + sf); NOT byte-identical to the
driver's generator — same schema, same distributions, which is what the
scaling audit needs. Usage:

    python tools/gen_sf.py 1 /root/repo/testdata_sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch a the line "
    "sort window spark order data column join small customer query big group "
    "stream filter vector"
).split()  # 31 words, matching the driver corpus vocabulary exactly

LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.14, 0.15, 0.15, 0.15]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

DAY_US = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"wrote {path}: {table.num_rows} rows")


def _day_ts(rng: np.random.Generator, n: int, lo: str, hi: str) -> pa.Array:
    lo_d = np.datetime64(lo).astype("datetime64[D]").astype(np.int64)
    hi_d = np.datetime64(hi).astype("datetime64[D]").astype(np.int64)
    days = rng.integers(lo_d, hi_d + 1, n)
    return pa.array(days * DAY_US, type=pa.timestamp("us"))


def generate(sf: float, out_dir: str, skew: bool = False, dim: int = 64) -> None:
    """skew=True produces the ADVERSARIAL twin (same schemas, same row
    counts): Zipf document lengths with a heavy tail, one mega-duplicate
    document cluster (~8% of the corpus are 2-word mutations of one
    template — every pair a genuine near-dup, so LSH band buckets and
    dedup windows see one pathological key), a hot embedding label
    (~50% of vectors in label 0) plus a 5%-of-corpus near-identical
    vector cluster, and Zipf-hot event users (the top user owns ~15-20%
    of events). Real corpora are Zipfian; the uniform fixtures never
    exercise AQE skew handling — this twin does.

    dim: embedding dimensionality (round-6 verdict #1: the reference is
    dim 1536, extract_and_embed.py:46). Row count scales by 64/dim so a
    --dim twin holds embedding BYTES roughly constant while stressing
    per-vector width (codegen chains, PCA dim² partials, 6 KB rows)."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(int(42 + sf * 1000) + (7 if skew else 0))

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = max(50, int(8_000 * sf * 64 // dim))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    pk = np.arange(n_part)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(pk, type=pa.int64()),
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0,
    }))

    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), type=pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _day_ts(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # l_orderkey uniform over orders => Poisson(n_li/n_ord) items per order,
    # the driver's observed shape; linenumber = per-order running index.
    lok = np.sort(rng.integers(0, n_ord, n_li))
    first = np.r_[True, lok[1:] != lok[:-1]]
    idx = np.arange(n_li)
    linenumber = idx - np.maximum.accumulate(np.where(first, idx, 0)) + 1
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lok, type=pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), type=pa.int64()),
        "l_linenumber": pa.array(linenumber, type=pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _day_ts(rng, n_li, "1995-01-02", "2001-11-04"),
    }))

    n_users = max(1, int(n_ev * 0.015))
    ts_lo = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(np.int64)
    ts_hi = np.datetime64("2024-01-31T00:00:00").astype("datetime64[us]").astype(np.int64)
    if skew:
        # Zipf(1.3) rank-frequency over users: the hot user owns ~15-20%
        uid = rng.zipf(1.3, n_ev) - 1
        uid = np.minimum(uid, n_users - 1)
    else:
        uid = rng.integers(0, n_users, n_ev)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), type=pa.int64()),
        "ts": pa.array(rng.integers(ts_lo, ts_hi, n_ev), type=pa.timestamp("us")),
        "user_id": pa.array(uid, type=pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    if skew:
        # heavy-tailed lengths: body 10..100 like the uniform law, plus a
        # Zipf tail reaching ~20x the uniform max
        lengths = rng.integers(10, 101, n_doc) + np.minimum(
            (rng.zipf(1.6, n_doc) - 1) * 10, 1900
        )
    else:
        lengths = rng.integers(10, 101, n_doc)
    flat = rng.integers(0, len(VOCAB), int(lengths.sum()))
    words = np.array(VOCAB)[flat]
    offsets = np.r_[0, np.cumsum(lengths)]
    texts = [" ".join(words[offsets[i]:offsets[i + 1]]) for i in range(n_doc)]
    sources = [f"src{i % 20}" for i in range(n_doc)]
    if skew:
        # one mega-duplicate cluster: ~8% of docs are the same 60-word
        # template with 2 random word substitutions (3-gram jaccard ~0.8,
        # far above every dedup threshold) — one pathological LSH bucket,
        # one hot n_chars-ish block, one giant connected component
        template = list(np.array(VOCAB)[rng.integers(0, len(VOCAB), 60)])
        n_mega = max(2, int(n_doc * 0.08))
        mega_ids = rng.choice(n_doc, n_mega, replace=False)
        for d in mega_ids:
            t = list(template)
            for p in rng.integers(0, 60, 2):
                t[p] = VOCAB[rng.integers(0, len(VOCAB))]
            texts[int(d)] = " ".join(t)
            sources[int(d)] = "src0"  # the mega cluster also heats one source
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), type=pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": sources,
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    vecs = rng.standard_normal((n_emb, dim))
    if skew:
        labels = np.where(
            rng.random(n_emb) < 0.5, 0, rng.integers(1, 10, n_emb)
        ).astype(np.int32)
        # 5% near-identical vector cluster (cosine ~0.999 to a shared base)
        n_dup = max(2, int(n_emb * 0.05))
        dup_ids = rng.choice(n_emb, n_dup, replace=False)
        base = rng.standard_normal(dim)
        vecs[dup_ids] = base + rng.standard_normal((n_dup, dim)) * 0.01
    else:
        labels = rng.integers(0, 10, n_emb).astype(np.int32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), type=pa.int64()),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }))


if __name__ == "__main__":
    argv = sys.argv[1:]
    dim = 64
    if "--dim" in argv:
        i = argv.index("--dim")
        dim = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--skew"]
    skew = "--skew" in argv
    sf = float(args[0]) if args else 1.0
    out = args[1] if len(args) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"testdata_sf{sf:g}" + ("skew" if skew else "") + (f"dim{dim}" if dim != 64 else ""),
    )
    generate(sf, out, skew=skew, dim=dim)
