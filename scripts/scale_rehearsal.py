#!/usr/bin/env python3
"""Generate an sfN-shaped rehearsal slice by deterministic K-fold
replication of /root/testdata/sf0.1 (local tooling only — the library
itself never uses this; it exists to measure the scaling exponent of the
headline queries, SCALE.md "10x rehearsal").

Usage: python3 scripts/scale_rehearsal.py [K] [outdir]

Shape-preserving, duplication-neutral replication:
- documents: doc_id offset per replica; text WORD-PERMUTED with a
  replica-seeded RNG so replicas do not become exact/near dups of each
  other (2-gram shingles don't survive permutation) — the near-dup RATE
  stays roughly constant as the corpus grows, like independently
  generated data, instead of every doc gaining K-1 clones (which would
  grow candidate pairs ~K^2 and measure a different workload).
  Replica 0 is the original corpus unchanged.
- events: event_id/user_id offsets per replica, ts written as
  TIMESTAMP(NANOS) (graft.sources.Tables reads the raw INT64 and
  normalizes any unit to epoch-nanos by magnitude, so either unit
  works; nanos kept here for continuity with earlier rehearsals).
- embeddings: vec_id offset; embedding circularly shifted by replica
  index (norm-preserving, direction-changing — replicas are not
  near-neighbors of each other). Replica 0 unchanged keeps the
  `vec_id < 10` probe set of ann_ivf_persisted constant.
- all other tables symlinked unchanged (warm-up queries read them).
"""
import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfr1"
DOC_STRIDE = 1_000_000
EVT_STRIDE = 100_000_000
USR_STRIDE = 10_000_000
VEC_STRIDE = 1_000_000

os.makedirs(OUT, exist_ok=True)

# Dimension tables stay symlinked — at real scale dimensions grow far
# slower than facts, and the TPC-H shapes' whole scaling argument is
# "dims broadcast, only the fact side grows".
for t in ["region", "nation", "customer", "supplier", "part"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)

# FACT tables replicate (round 12): orders/lineitem were symlinked before,
# which made every TPC-H gate row measure a constant-size input (the
# flat/negative exponents r12 observed). Each replica offsets o_orderkey/
# l_orderkey by ORD_STRIDE so per-order join cardinalities are preserved;
# customer/supplier/part keys stay in-range against the fixed dims.
ORD_STRIDE = 100_000_000
con = duckdb.connect()
sels = {
    "orders": ("SELECT o_orderkey + {off} AS o_orderkey, o_custkey, "
               "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
               f"FROM '{SRC}/orders.parquet'"),
    "lineitem": ("SELECT l_orderkey + {off} AS l_orderkey, l_partkey, "
                 "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                 "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
                 f"FROM '{SRC}/lineitem.parquet'"),
}
for t, sel in sels.items():
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        union = " UNION ALL ".join(
            sel.format(off=k * ORD_STRIDE) for k in range(K))
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        print(f"{t}: replicated x{K}")

# ---- documents ------------------------------------------------------------
docs = duckdb.sql(f"SELECT * FROM '{SRC}/documents.parquet' ORDER BY doc_id") \
    .fetchdf()
rows = {c: [] for c in ["doc_id", "text", "lang", "source", "n_chars"]}
for k in range(K):
    for doc_id, text, lang, source, _ in docs.itertuples(index=False):
        if k == 0:
            t = text
        else:
            words = text.split(" ")
            rng = random.Random((k << 32) ^ doc_id)
            rng.shuffle(words)
            t = " ".join(words)
        rows["doc_id"].append(doc_id + k * DOC_STRIDE)
        rows["text"].append(t)
        rows["lang"].append(lang)
        rows["source"].append(source)
        rows["n_chars"].append(len(t))
pq.write_table(pa.table({
    "doc_id": pa.array(rows["doc_id"], pa.int64()),
    "text": pa.array(rows["text"], pa.string()),
    "lang": pa.array(rows["lang"], pa.string()),
    "source": pa.array(rows["source"], pa.string()),
    "n_chars": pa.array(rows["n_chars"], pa.int64()),
}), f"{OUT}/documents.parquet")
print(f"documents: {len(rows['doc_id'])}")

# ---- events ---------------------------------------------------------------
ev = duckdb.sql(f"SELECT * FROM '{SRC}/events.parquet'").fetchdf()
ev["ts"] = ev["ts"].astype("datetime64[ns]")
parts = []
for k in range(K):
    e = ev.copy()
    e["event_id"] = e["event_id"] + k * EVT_STRIDE
    e["user_id"] = e["user_id"] + k * USR_STRIDE
    parts.append(e)
import pandas as pd
allev = pd.concat(parts, ignore_index=True)
tbl = pa.Table.from_pandas(allev, preserve_index=False)
assert tbl.schema.field("ts").type == pa.timestamp("ns"), tbl.schema
pq.write_table(tbl, f"{OUT}/events.parquet",
               coerce_timestamps=None, allow_truncated_timestamps=False)
print(f"events: {len(allev)}")

# ---- embeddings -----------------------------------------------------------
emb = duckdb.sql(f"SELECT * FROM '{SRC}/embeddings.parquet' ORDER BY vec_id") \
    .fetchdf()
vec_ids, vecs, labels = [], [], []
for k in range(K):
    for vec_id, v, label in emb.itertuples(index=False):
        v = list(v)
        vec_ids.append(vec_id + k * VEC_STRIDE)
        vecs.append(v[k % len(v):] + v[:k % len(v)] if k else v)
        labels.append(label)
pq.write_table(pa.table({
    "vec_id": pa.array(vec_ids, pa.int64()),
    "embedding": pa.array(vecs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}), f"{OUT}/embeddings.parquet")
print(f"embeddings: {len(vec_ids)}")
