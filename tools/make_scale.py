#!/usr/bin/env python3
"""Synthesize an N-replica scale-up of a testdata SF dir for perf probes.

Replicates each table with per-replica key offsets so keys stay distinct
and per-key distributions hold; replica document words get a per-replica
suffix so replicas are NOT near-duplicates (dedup selectivity stays
realistic). The timestamp[ns] events schema is preserved byte-for-byte.
Dev/bench tool only — oracle gates always run on the driver's own
/root/testdata dirs, never on generated dirs.

Usage: python3 tools/make_scale.py <reps> <dst>   (src = /root/testdata/sf0.1)
e.g.   python3 tools/make_scale.py 10 target/sf1
       python3 tools/make_scale.py 100 target/sf10
"""
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = '/root/testdata/sf0.1'
OFF = 10_000_000
REPS = int(sys.argv[1])
DST = sys.argv[2]
t0 = time.time()


def offset(tbl, cols, rep):
    for c in cols:
        i = tbl.schema.get_field_index(c)
        tbl = tbl.set_column(i, tbl.schema.field(i), pc.add(tbl.column(c), rep * OFF))
    return tbl


def replicate(name, keycols, transform=None):
    orig = pq.read_table(f'{SRC}/{name}.parquet')
    # stream one replica at a time: 100 replicas of lineitem would be GBs
    # of Arrow buffers if concatenated in memory first
    writer = pq.ParquetWriter(f'{DST}/{name}.parquet', orig.schema)
    rows = 0
    for rep in range(REPS):
        t = orig if rep == 0 else offset(orig, keycols, rep)
        if transform and rep > 0:
            t = transform(t, rep)
        writer.write_table(t)
        rows += t.num_rows
    writer.close()
    print(name, rows, f'{time.time()-t0:.0f}s', flush=True)


def doc_transform(t, rep):
    texts = t.column('text').to_pylist()
    new = [' '.join(w + f'r{rep}' for w in tx.split(' ')) if tx else tx
           for tx in texts]
    i = t.schema.get_field_index('text')
    return t.set_column(i, t.schema.field(i), pa.array(new, type=pa.string()))


def emb_transform(t, rep):
    # same not-a-near-duplicate contract as documents: flip each replica's
    # vectors by a deterministic per-(rep, dim) sign pattern. Within-replica
    # geometry is EXACTLY preserved (cosine is invariant when both vectors
    # wear the same pattern), but cross-replica vectors decorrelate — a
    # verbatim replica would make every vector a 10-way exact duplicate and
    # quadratically explode every bucket-blocked dedup gate (measured: dd7
    # 9.9 s -> 35 s at sf1 from replica pile-up alone).
    i = t.schema.get_field_index('embedding')
    col = t.column('embedding').to_pylist()
    dim = max((len(v) for v in col if v is not None), default=0)
    signs = [1.0 if ((rep * 1315423911 + d * 2654435761) >> 7) & 1 == 0
             else -1.0 for d in range(dim)]
    new = [None if v is None else [x * signs[j] for j, x in enumerate(v)]
           for v in col]
    return t.set_column(i, t.schema.field(i),
                        pa.array(new, type=t.schema.field(i).type))


replicate('documents', ['doc_id'], doc_transform)
replicate('embeddings', ['vec_id'], emb_transform)
replicate('events', ['event_id', 'user_id'])
replicate('lineitem', ['l_orderkey', 'l_partkey', 'l_suppkey'])
replicate('orders', ['o_orderkey', 'o_custkey'])
replicate('customer', ['c_custkey'])
replicate('supplier', ['s_suppkey'])
replicate('part', ['p_partkey'])
for small in ['nation', 'region']:
    pq.write_table(pq.read_table(f'{SRC}/{small}.parquet'), f'{DST}/{small}.parquet')
    print(small, 'copied', flush=True)
print('done', f'{time.time()-t0:.0f}s')
