"""Deterministic scale-factor dataset generator (sf1 and beyond).

The driver ships fixtures only up to sf0.1 (TESTDATA.md); the scale
story needs at least one decade more. This synthesizer reproduces the
fixtures' schemas and per-column distributions — profiled empirically
from /root/testdata/sf0.1 (see docstrings per table) — at any sf, with
the same seed-42 determinism, so `tools/verify_local.py` (Spark vs
DuckDB on the SAME files — the oracle needs no distribution match) and
`bench.py` both run unmodified against the output directory.

Usage:
    python tools/gen_sf.py [sf] [out_dir]
    # default: sf=1, out_dir=/root/repo/.scratch/sf1

Memory profile: payload columns are generated in CHUNK-row slices
through a single pyarrow ParquetWriter, but two tables keep full-length
KEY arrays in memory — lineitem's globally-sorted orderkeys (+ the
linenumber rank derived from them) and events' sorted timestamps — so
peak RSS grows linearly with sf at ~5 int64 columns of the largest
table: ~2.5 GB transient at sf10 (measured fine), ~25 GB at sf100,
where the sort/rank would need to move per-chunk (inverse-CDF sampling
of sorted uniforms). Strings with small domains go through
dictionary-encoded arrays.

Fidelity notes (profiled sf0.1, duckdb):
- row counts scale linearly: lineitem 6M/sf, orders 1.5M/sf, customer
  150K/sf, part 200K/sf, supplier 10K/sf, events 1M/sf, documents
  50K/sf (floor 500), embeddings 20K/sf (floor 500); nation/region are
  copied verbatim from the sf0.1 fixture (fixed dimension tables).
- lineitem: l_orderkey uniform over orders (⇒ Poisson(4) lines/order,
  ~1.8% of orders childless — matches fixture's 2764/150000);
  l_linenumber is the 1-based rank within the order; quantity
  randint(1,50); extendedprice/shipdate INDEPENDENT uniform draws
  (fixture ratio/datediff probes show no correlation with quantity or
  o_orderdate); discount 0..0.10 and tax 0..0.08 in cent steps;
  returnflag/linestatus independent uniform over {A,N,R}x{F,O}.
- events: ts = sorted uniform draws over [2024-01-01, 2024-01-31) at
  µs granularity (written timestamp[us], the post-round-4 unit);
  user_id uniform over 15K/sf users; value ~ Exp(mean 50) rounded to
  2dp clipped at 0.01 (fixture: mean 49.87, median 34.73 ≈ 50·ln2);
  props = {"k": randint(0,100)}.
- documents: uniform(10,100) tokens from the fixture's exact 31-word
  vocab; lang ∝ (en .4, es/zh/de/fr .15); source uniform src0..19;
  near-dup structure emerges from the tiny vocab exactly as it does in
  the fixture (no planted pairs there either).
- embeddings: 64-d standard normal, L2-normalized; label uniform 0..9
  (fixture labels are geometrically meaningless: within-cluster
  scatter 1.0 vs between-centroid 0.1).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/root/testdata/sf0.1"  # source for nation/region + vocab
CHUNK = 1_000_000

VOCAB = [
    "the", "part", "scan", "slow", "agg", "key", "window", "table",
    "merge", "join", "query", "row", "stream", "line", "small", "group",
    "spark", "fast", "customer", "batch", "data", "sort", "value",
    "hash", "filter", "big", "dup", "column", "order", "a", "vector",
]
LANGS = ["en", "es", "zh", "de", "fr"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
MKT_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ORDER_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_ADJ = ["large", "hot", "blue", "red", "green", "small", "cold", "dark"]
PART_NOUN = ["ring", "bolt", "screw", "plate", "gear", "rod", "cap", "tube"]
PART_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
DAY_US = 86_400_000_000


def _counts(sf: float) -> dict[str, int]:
    return {
        "customer": round(150_000 * sf),
        "supplier": round(10_000 * sf),
        "part": round(200_000 * sf),
        "orders": round(1_500_000 * sf),
        "lineitem": round(6_000_000 * sf),
        "events": round(1_000_000 * sf),
        "documents": max(500, round(50_000 * sf)),
        "embeddings": max(500, round(20_000 * sf)),
    }


def _dict_arr(codes: np.ndarray, values: list[str]) -> pa.Array:
    return pa.DictionaryArray.from_arrays(
        pa.array(codes, type=pa.int32()), pa.array(values)
    ).cast(pa.string())


def _ts_us(int_us: np.ndarray) -> pa.Array:
    return pa.array(int_us, type=pa.timestamp("us"))


def _write_chunks(path: str, schema: pa.Schema, chunks) -> None:
    with pq.ParquetWriter(path, schema) as w:
        for batch in chunks:
            w.write_table(pa.Table.from_arrays(batch, schema=schema))


def gen_customer(rng, n, out):
    schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
         ("c_mktsegment", pa.string())]
    )

    def chunks():
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            keys = np.arange(lo, hi, dtype=np.int64)
            yield [
                pa.array(keys),
                pa.array([f"Customer#{k:09d}" for k in keys]),
                pa.array(rng.integers(0, 25, hi - lo).astype(np.int32)),
                pa.array(np.round(rng.uniform(-1000, 10000, hi - lo), 2)),
                _dict_arr(rng.integers(0, 5, hi - lo), MKT_SEGMENTS),
            ]

    _write_chunks(out, schema, chunks())


def gen_supplier(rng, n, out):
    schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()),
         ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]
    )
    keys = np.arange(n, dtype=np.int64)
    _write_chunks(out, schema, [[
        pa.array(keys),
        pa.array([f"Supplier#{k:09d}" for k in keys]),
        pa.array(rng.integers(0, 25, n).astype(np.int32)),
        pa.array(np.round(rng.uniform(-1000, 10000, n), 2)),
    ]])


def gen_part(rng, n, out):
    schema = pa.schema(
        [("p_partkey", pa.int64()), ("p_name", pa.string()),
         ("p_brand", pa.string()), ("p_type", pa.string()),
         ("p_size", pa.int32()), ("p_retailprice", pa.float64())]
    )
    names = [f"{a} {b}" for a in PART_ADJ for b in PART_NOUN]
    brands = [f"Brand#{i}" for i in range(1, 26)]

    def chunks():
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            m = hi - lo
            yield [
                pa.array(np.arange(lo, hi, dtype=np.int64)),
                _dict_arr(rng.integers(0, len(names), m), names),
                _dict_arr(rng.integers(0, 25, m), brands),
                _dict_arr(rng.integers(0, 6, m), PART_TYPES),
                pa.array(rng.integers(1, 51, m).astype(np.int32)),
                pa.array(np.round(rng.uniform(900, 1000, m), 2)),
            ]

    _write_chunks(out, schema, chunks())


def gen_orders(rng, n, n_cust, out):
    schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
         ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
         ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())]
    )
    n_days = int(
        (np.datetime64("2001-08-02") - np.datetime64("1995-01-01"))
        / np.timedelta64(1, "D")
    )
    base = np.datetime64("1995-01-01T00:00:00", "us").astype("int64")

    def chunks():
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            m = hi - lo
            yield [
                pa.array(np.arange(lo, hi, dtype=np.int64)),
                pa.array(rng.integers(0, n_cust, m)),
                _dict_arr(rng.integers(0, 3, m), ["O", "P", "F"]),
                pa.array(np.round(rng.uniform(1000, 500000, m), 2)),
                _ts_us(base + rng.integers(0, n_days, m) * DAY_US),
                _dict_arr(rng.integers(0, 5, m), ORDER_PRIORITIES),
            ]

    _write_chunks(out, schema, chunks())


def gen_lineitem(rng, n, n_orders, n_part, n_supp, out):
    """Orderkeys drawn uniform then SORTED (run-length locality like the
    fixture's order-clustered layout); l_linenumber = 1-based rank
    within each order, computed per-chunk from the global sort."""
    schema = pa.schema(
        [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
         ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
         ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
         ("l_discount", pa.float64()), ("l_tax", pa.float64()),
         ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
         ("l_shipdate", pa.timestamp("us"))]
    )
    orderkeys = np.sort(rng.integers(0, n_orders, n))
    # rank within order: position - index of the run's first element
    run_starts = np.r_[0, np.flatnonzero(np.diff(orderkeys)) + 1]
    first_pos = np.zeros(n, dtype=np.int64)
    first_pos[run_starts] = run_starts
    first_pos = np.maximum.accumulate(first_pos)
    linenumber = (np.arange(n) - first_pos + 1).astype(np.int32)

    base = np.datetime64("1995-01-02T00:00:00", "us").astype("int64")
    n_days = int(
        (np.datetime64("2001-11-05") - np.datetime64("1995-01-02"))
        / np.timedelta64(1, "D")
    )

    def chunks():
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            m = hi - lo
            yield [
                pa.array(orderkeys[lo:hi]),
                pa.array(rng.integers(0, n_part, m)),
                pa.array(rng.integers(0, n_supp, m)),
                pa.array(linenumber[lo:hi]),
                pa.array(rng.integers(1, 51, m).astype(np.float64)),
                pa.array(np.round(rng.uniform(900, 105000, m), 2)),
                pa.array(rng.integers(0, 11, m) / 100.0),
                pa.array(rng.integers(0, 9, m) / 100.0),
                _dict_arr(rng.integers(0, 3, m), ["A", "N", "R"]),
                _dict_arr(rng.integers(0, 2, m), ["F", "O"]),
                _ts_us(base + rng.integers(0, n_days, m) * DAY_US),
            ]

    _write_chunks(out, schema, chunks())


def gen_events(rng, n, out):
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())]
    )
    span_us = 30 * DAY_US
    ts = EPOCH_2024 + np.sort(rng.integers(0, span_us, n))
    n_users = max(1, round(n * 0.015))  # 15K users per 1M events

    def chunks():
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            m = hi - lo
            ks = rng.integers(0, 100, m)
            yield [
                pa.array(np.arange(lo, hi, dtype=np.int64)),
                _ts_us(ts[lo:hi]),
                pa.array(rng.integers(0, n_users, m)),
                _dict_arr(rng.integers(0, 5, m), EVENT_TYPES),
                pa.array(np.maximum(np.round(rng.exponential(50.0, m), 2), 0.01)),
                pa.array([f'{{"k": {k}}}' for k in ks]),
            ]

    _write_chunks(out, schema, chunks())


def gen_documents(rng, n, out):
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string()),
         ("n_chars", pa.int64())]
    )
    vocab = np.array(VOCAB)
    sources = [f"src{i}" for i in range(20)]

    def chunks():
        step = 100_000
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            m = hi - lo
            lens = rng.integers(10, 101, m)
            flat = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
            texts, pos = [], 0
            for ln in lens:
                texts.append(" ".join(flat[pos:pos + ln]))
                pos += ln
            yield [
                pa.array(np.arange(lo, hi, dtype=np.int64)),
                pa.array(texts),
                _dict_arr(rng.choice(5, m, p=LANG_P), LANGS),
                _dict_arr(rng.integers(0, 20, m), sources),
                pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
            ]

    _write_chunks(out, schema, chunks())


def gen_embeddings(rng, n, out):
    schema = pa.schema(
        [("vec_id", pa.int64()),
         ("embedding", pa.list_(pa.float32())),
         ("label", pa.int32())]
    )

    def chunks():
        step = 200_000
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            m = hi - lo
            vecs = rng.standard_normal((m, 64)).astype(np.float32)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            flat = pa.array(vecs.ravel(), type=pa.float32())
            offsets = pa.array(np.arange(0, (m + 1) * 64, 64, dtype=np.int32))
            yield [
                pa.array(np.arange(lo, hi, dtype=np.int64)),
                pa.ListArray.from_arrays(offsets, flat),
                pa.array(rng.integers(0, 10, m).astype(np.int32)),
            ]

    _write_chunks(out, schema, chunks())


def generate(sf: float, out_dir: str, seed: int = 42) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    counts = _counts(sf)
    rng = np.random.default_rng(seed)
    # fixed dims: verbatim copy keeps nation/region semantics identical
    for t in ("nation", "region"):
        pq.write_table(
            pq.read_table(os.path.join(FIXTURE_DIR, f"{t}.parquet")),
            os.path.join(out_dir, f"{t}.parquet"),
        )
    p = lambda t: os.path.join(out_dir, f"{t}.parquet")  # noqa: E731
    gen_customer(rng, counts["customer"], p("customer"))
    gen_supplier(rng, counts["supplier"], p("supplier"))
    gen_part(rng, counts["part"], p("part"))
    gen_orders(rng, counts["orders"], counts["customer"], p("orders"))
    gen_lineitem(
        rng, counts["lineitem"], counts["orders"], counts["part"],
        counts["supplier"], p("lineitem"),
    )
    gen_events(rng, counts["events"], p("events"))
    gen_documents(rng, counts["documents"], p("documents"))
    gen_embeddings(rng, counts["embeddings"], p("embeddings"))
    manifest = {"sf": sf, "seed": seed, "counts": counts}
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.scratch/sf{sf:g}"
    m = generate(sf, out)
    print(json.dumps(m))
