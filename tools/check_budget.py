#!/usr/bin/env python3
"""check.py with a per-query wall-clock budget — for deep-scale (sf10)
oracle replays where some oracles are known capacity hazards (O(n^2)
q_skyline, recursive CTEs over millions of rows). Each oracle runs in
its own process; one that exceeds the budget is killed and recorded as
CAPACITY (an oracle limitation, NOT an engine failure — the engine
side already produced its dump). Exit code 1 only on a real FAIL.

Usage: python3 tools/check_budget.py <sfDir> <verifyOutDir> [budget_sec]
"""
import json
import multiprocessing as mp
import os
import sys


def run_one(sf_dir, out_dir, name, sql, q, eps=None):
    # child process: fresh connection, bounded temp spill
    import duckdb
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check import TABLES, canon, type_diffs, eps_equal
    con = duckdb.connect()
    tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    mem = os.environ.get("GRAFT_DUCK_MEM", "24GB")
    con.execute(f"SET memory_limit='{mem}'")
    # bound the spill too: with several workers sharing one disk, an
    # uncapped O(n^2) oracle fills the volume and fails its SIBLINGS
    tmpmax = os.environ.get("GRAFT_DUCK_TMPMAX", "15GB")
    con.execute(f"SET max_temp_directory_size='{tmpmax}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    try:
        res = con.execute(sql)
        onames = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:
        msg = str(e)
        # resource exhaustion while running the ORACLE query is a
        # CAPACITY event (the engine dump is already on disk) — but
        # only here: a resource error while reading the ENGINE dump
        # below stays a FAIL (a malformed/oversized dump is a defect)
        if ("No space left" in msg or "max_temp_directory_size" in msg
                or "Out of Memory" in msg or "OutOfMemory" in msg):
            q.put(("CAPACITY", f"oracle resources: {msg[:200]}"))
        else:
            q.put(("FAIL", f"oracle error: {e}"))
        return
    try:
        sres = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        snames = [d[0] for d in sres.description]
        srows = sres.fetchall()
    except Exception as e:
        q.put(("FAIL", f"engine dump read error: {e}"))
        return
    ocols, ocanon = canon(orows, onames)
    scols, scanon = canon(srows, snames)
    if ocols != scols:
        q.put(("FAIL", f"columns oracle={ocols} spark={scols}"))
        return
    if len(ocanon) != len(scanon):
        q.put(("FAIL", f"rows oracle={len(ocanon)} spark={len(scanon)}"))
        return
    eps_note = ""
    if ocanon != scanon:
        if eps:
            d = eps_equal(ocanon, scanon, ocols, eps)
            if d is not None:
                q.put(("FAIL", f"beyond declared epsilon; "
                               f"first: oracle={d[0]} spark={d[1]}"))
                return
            # within tolerance: fall through to the physical-type
            # audit below — a declared epsilon on values must not
            # waive the driver-hash type proxy the exact path enforces
            eps_note = f"; within declared epsilon on {sorted(eps)}"
        else:
            diffs = [(a, b) for a, b in zip(ocanon, scanon) if a != b]
            q.put(("FAIL", f"{len(diffs)}/{len(ocanon)} rows differ; "
                           f"first: oracle={diffs[0][0]} spark={diffs[0][1]}"))
            return
    n_rows = len(ocanon)
    # free the big row buffers BEFORE the type audit and the queue
    # put: at deep scale the DuckDB cap plus two materialized result
    # sets can leave too little memory to even start the queue's
    # feeder thread (observed: values equal, then "can't start new
    # thread" reporting the PASS)
    del orows, srows, ocanon, scanon
    import gc
    gc.collect()
    try:
        tdiffs = type_diffs(con, sql, f"{out_dir}/{name}/*.parquet")
    except (KeyboardInterrupt, SystemExit):
        raise
    except Exception as e:
        # the physical-type audit needs a fresh pyarrow import, which
        # can fail to mmap while DuckDB holds a deep-scale memory cap —
        # values already compared equal above, so report that, noted.
        # Interrupts re-raise (a Ctrl-C must never record a PASS);
        # MemoryError is an Exception and stays in the skip path.
        con.close()
        q.put(("PASS", f"{n_rows} rows{eps_note}; type audit skipped: "
               f"{type(e).__name__}"))
        return
    if tdiffs:
        q.put(("FAIL", "values equal but physical types differ: "
               + ", ".join(f"{c} o={o} s={s}" for c, o, s in tdiffs)))
        return
    con.close()
    q.put(("PASS", f"{n_rows} rows{eps_note}"))


def wipe_tmp():
    # a budget-killed child leaves its spill files behind — tens of GB
    # after a capacity oracle; reclaim before the next query
    import shutil
    tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/duck_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)


def main(sf_dir, out_dir, budget):
    wipe_tmp()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check import load_epsilon
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    epsilon = load_epsilon(out_dir)
    n_pass = n_fail = n_cap = 0
    for name, sql in sorted(oracle.items()):
        q = mp.Queue()
        p = mp.Process(target=run_one,
                       args=(sf_dir, out_dir, name, sql, q,
                             epsilon.get(name)))
        p.start()
        p.join(budget)
        if p.is_alive():
            p.terminate()
            p.join()
            wipe_tmp()
            print(f"CAPACITY {name}: oracle exceeded {budget}s budget",
                  flush=True)
            n_cap += 1
            continue
        if q.empty():
            # child died (OOM-killed during spill, etc.) — also a
            # capacity event, the oracle never produced a verdict
            print(f"CAPACITY {name}: oracle process died "
                  f"(exitcode {p.exitcode})", flush=True)
            n_cap += 1
            continue
        status, msg = q.get()
        print(f"{status} {name} ({msg})" if status == "PASS"
              else f"{status} {name}: {msg}", flush=True)
        if status == "PASS":
            n_pass += 1
        elif status == "CAPACITY":
            wipe_tmp()
            n_cap += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_cap} capacity")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 600))
