"""Local scale-factor synthesizer for OPTIMIZATION-round measurement.

The driver measures the round at a driver-generated scale factor
(sf1.0 in BENCH_r05.json) that is not present under /root/testdata in
this sandbox.  This tool derives an sf1.0-*shaped* dataset from the
read-only sf0.1 tables so before/after timings can be taken at the
driver's scale.  It is measurement tooling only: bench.py and the
oracle path never read its output.

Scaling is deterministic (seeded by table name + replica index):

* key tables (customer/part/supplier/orders/lineitem/events) — R
  replicas with dense key offsets, foreign keys offset consistently so
  join fan-outs match a real larger instance;
* documents — word-shuffle per (text-hash, replica): unigram term
  statistics (BM25 / df / aggregations) are preserved exactly, exact
  duplicate groups stay exact duplicates within a replica, and
  near-duplicate density does NOT inflate quadratically the way naive
  replication would;
* embeddings — one random orthogonal rotation per replica: every
  within-replica cosine (near-dup pairs, cluster structure, IVF
  geometry) is preserved exactly, cross-replica similarities are
  scrambled;
* region/nation — fixed dimensions, copied as-is.

Usage:  python tools/make_sf.py [R] [out_dir]
        (defaults: R=10, out dir /root/sfscale/sf1.0)
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("MAKE_SF_SRC", "/root/testdata/sf0.1")


def _seed(*parts) -> int:
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big") % (2**32)


def _offset_cols(t: pa.Table, r: int, offsets: dict[str, int]) -> pa.Table:
    for col, base in offsets.items():
        idx = t.schema.get_field_index(col)
        shifted = pc.add(t[col], pa.scalar(r * base, type=t[col].type))
        t = t.set_column(idx, col, shifted.cast(t.schema.field(col).type))
    return t


def _shuffle_words(texts: list[str], r: int) -> list[str]:
    out = []
    for s in texts:
        words = s.split(" ")
        rng = np.random.default_rng(_seed("doc", hashlib.md5(s.encode()).hexdigest(), r))
        rng.shuffle(words)
        out.append(" ".join(words))
    return out


def _rotation(dim: int, r: int) -> np.ndarray:
    rng = np.random.default_rng(_seed("emb_rot", r))
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    return q.astype(np.float32)


def main() -> None:
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/sfscale/sf1.0"
    os.makedirs(out_dir, exist_ok=True)

    n = {t: pq.read_metadata(f"{SRC}/{t}.parquet").num_rows
         for t in ("customer", "part", "supplier", "orders", "lineitem",
                   "events", "documents", "embeddings")}
    plans = {
        "customer": {"c_custkey": n["customer"]},
        "part": {"p_partkey": n["part"]},
        "supplier": {"s_suppkey": n["supplier"]},
        "orders": {"o_orderkey": n["orders"], "o_custkey": n["customer"]},
        "lineitem": {"l_orderkey": n["orders"], "l_partkey": n["part"],
                     "l_suppkey": n["supplier"]},
        "events": {"event_id": n["events"], "user_id": 1500},
        "documents": {"doc_id": n["documents"]},
        "embeddings": {"vec_id": n["embeddings"]},
    }

    for name in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{out_dir}/{name}.parquet")
        print(name, "copied")

    for name, offsets in plans.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        reps = []
        for r in range(R):
            t = _offset_cols(base, r, offsets)
            if name == "documents" and r > 0:
                texts = _shuffle_words(base["text"].to_pylist(), r)
                ti = t.schema.get_field_index("text")
                t = t.set_column(ti, "text", pa.array(texts, type=pa.string()))
                ni = t.schema.get_field_index("n_chars")
                t = t.set_column(
                    ni, "n_chars",
                    pa.array([len(s) for s in texts], type=pa.int64()))
            if name == "embeddings" and r > 0:
                vecs = np.array(base["embedding"].to_pylist(), dtype=np.float32)
                rot = vecs @ _rotation(vecs.shape[1], r)
                rot /= np.linalg.norm(rot, axis=1, keepdims=True)
                ei = t.schema.get_field_index("embedding")
                t = t.set_column(
                    ei, "embedding",
                    pa.array(rot.tolist(), type=t.schema.field("embedding").type))
            if name == "events" and r > 0:
                rng = np.random.default_rng(_seed("ev_ts", r))
                jit = rng.integers(-60_000_000, 60_000_000, len(base))
                ts = pc.add(base["ts"].cast(pa.int64()), pa.array(jit)) \
                    .cast(pa.timestamp("us"))
                si = t.schema.get_field_index("ts")
                t = t.set_column(si, "ts", ts)
            reps.append(t)
        big = pa.concat_tables(reps)
        pq.write_table(big, f"{out_dir}/{name}.parquet",
                       row_group_size=1 << 20)
        print(name, big.num_rows, "rows")

    open(f"{out_dir}/_DONE", "w").close()


if __name__ == "__main__":
    main()
