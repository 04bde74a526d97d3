#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query parquet dumped by graft.Verify, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the same source tables, sorts columns by
name and rows by value, and compares cell-by-cell (small float tolerance for
diagnostics; also reports exact-hash match, which is what the driver checks).
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [names[i] for i in order], out


def load_epsilon(out_dir):
    """Per-query declared tolerances (oracle_epsilon.json, written by
    graft.Verify from SparkEntry.oracleEpsilon): {query: {column:
    rel_tol}}. Scoped to engine-owned float boundaries only — e.g.
    q_stats_footer's DOUBLE footer sum, where ORC stores the sum as a
    double so summation ORDER is engine-owned (exact through sf1,
    3.5e-14 relative divergence at sf10). Everything else stays exact."""
    p = os.path.join(out_dir, "oracle_epsilon.json")
    if os.path.exists(p):
        return json.load(open(p))
    return {}


def eps_equal(ocanon, scanon, cols, eps):
    """Tolerant re-compare after an exact mismatch: every column exact
    EXCEPT those declared in eps, which compare as floats under a
    relative tolerance. Requires the non-eps columns to determine row
    order (true for keyed stat tables): rows are PAIRED by sorting on
    the non-eps key, so a duplicate key would make the pairing
    ambiguous — that case fails loudly instead of silently mispairing.
    Returns the first diff or None."""
    import collections
    eidx = {i for i, c in enumerate(cols) if c in eps}
    key = lambda r: tuple(v for i, v in enumerate(r) if i not in eidx)
    for side, rows in (("oracle", ocanon), ("spark", scanon)):
        dup = [k for k, n in collections.Counter(
            key(r) for r in rows).items() if n > 1]
        if dup:
            return ((f"{side} rows tie on non-eps key {dup[0]!r} — "
                     "epsilon pairing ambiguous, declare a keyed "
                     "result or compare exact",), ("",))
    orows = sorted(ocanon, key=key)
    srows = sorted(scanon, key=key)
    for a, b in zip(orows, srows):
        for i, (x, y) in enumerate(zip(a, b)):
            if i not in eidx:
                if x != y:
                    return (a, b)
                continue
            if x == y:
                continue
            try:
                fx, fy = float(x), float(y)
            except ValueError:
                return (a, b)
            tol = eps[cols[i]]
            if not (abs(fx - fy) <= tol * max(abs(fx), abs(fy), 1.0)):
                return (a, b)
    return None


def type_key(t):
    """Collapse an arrow type to the physical family the driver's hasher
    distinguishes (int64 vs int128/decimal vs float vs string...), ignoring
    benign annotation differences (timestamp tz, large_string)."""
    import pyarrow as pa
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_key(t.value_type)}>"
    return str(t)


def type_diffs(con, sql, parquet_glob):
    import pyarrow.parquet  # noqa: F401
    otab = con.execute(sql).arrow()
    stab = con.execute(
        f"SELECT * FROM read_parquet('{parquet_glob}')").arrow()
    ot = {f.name: type_key(f.type) for f in otab.schema}
    st = {f.name: type_key(f.type) for f in stab.schema}
    return [(c, ot[c], st[c]) for c in sorted(set(ot) & set(st))
            if ot[c] != st[c]]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata are single files; ScaleUp output is a Spark
        # directory of part files — glob in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    epsilon = load_epsilon(out_dir)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            onames = [d[0] for d in res.description]
            orows = res.fetchall()
            sres = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            snames = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        ocols, ocanon = canon(orows, onames)
        scols, scanon = canon(srows, snames)
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        if len(ocanon) != len(scanon):
            print(f"FAIL {name}: rows oracle={len(ocanon)} spark={len(scanon)}")
            n_fail += 1
            continue
        if ocanon == scanon:
            tdiffs = type_diffs(con, sql, f"{out_dir}/{name}/*.parquet")
            if tdiffs:
                print(f"FAIL {name}: values equal but physical types differ "
                      f"(driver hash would mismatch): "
                      + ", ".join(f"{c} oracle={o} spark={s}"
                                  for c, o, s in tdiffs))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(ocanon)} rows)")
                n_pass += 1
        elif name in epsilon:
            d = eps_equal(ocanon, scanon, ocols, epsilon[name])
            if d is None:
                # the declared-epsilon PASS path enforces the same
                # physical-type audit as the exact path — a tolerance
                # on values must not waive the driver-hash type proxy
                tdiffs = type_diffs(con, sql, f"{out_dir}/{name}/*.parquet")
                if tdiffs:
                    print(f"FAIL {name}: within epsilon but physical "
                          f"types differ: "
                          + ", ".join(f"{c} oracle={o} spark={s}"
                                      for c, o, s in tdiffs))
                    n_fail += 1
                else:
                    print(f"PASS {name} ({len(ocanon)} rows; within "
                          f"declared epsilon on {sorted(epsilon[name])})")
                    n_pass += 1
            else:
                print(f"FAIL {name}: beyond declared epsilon; "
                      f"first: oracle={d[0]} spark={d[1]}")
                n_fail += 1
        else:
            diffs = [(a, b) for a, b in zip(ocanon, scanon) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(ocanon)} rows differ; "
                  f"first: oracle={diffs[0][0]} spark={diffs[0][1]}")
            n_fail += 1
    # queries with no oracle: rows-only
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
