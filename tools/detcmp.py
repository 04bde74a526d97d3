#!/usr/bin/env python3
"""Determinism compare: canonical hash of two Verify dumps per query."""
import os, sys, math, hashlib
import pyarrow.parquet as pq

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)

def canon_hash(d):
    files = [f for f in os.listdir(d) if f.endswith('.parquet')]
    if not files:
        return None
    t = pq.read_table(os.path.join(d, files[0]))
    names = sorted(t.column_names)
    cols = [t.column(n).to_pylist() for n in names]
    rows = sorted(tuple(norm(c[i]) for c in cols) for i in range(t.num_rows))
    h = hashlib.md5()
    for r in rows:
        h.update(('\x1f'.join(r) + '\x1e').encode())
    return (t.num_rows, h.hexdigest())

a, b = sys.argv[1], sys.argv[2]
qs = sorted(q for q in os.listdir(a) if q.startswith('q'))
bad = 0
for q in qs:
    if not os.path.isdir(os.path.join(b, q)):
        print('MISSING', q); bad += 1; continue
    ha, hb = canon_hash(os.path.join(a, q)), canon_hash(os.path.join(b, q))
    if ha != hb:
        print('DIFF', q, ha, hb); bad += 1
print(f'== {len(qs) - bad} stable, {bad} partition-dependent')
