#!/usr/bin/env python3
"""Sharded driver for check_budget.py — the deep-scale (sf10) full-suite
oracle replay. Splits oracle_sql.json into N shards (round-robin over
the sorted names so heavy oracles spread out), builds per-shard dirs of
symlinks into the real verify dump, and runs N check_budget workers in
parallel, each with its own DuckDB temp dir and memory cap (the
GRAFT_DUCK_TMP / GRAFT_DUCK_MEM env contract added in r15). Merges the
per-shard verdict lines and prints one combined tally.

Usage: check_budget_par.py <sfDir> <verifyOutDir> [budget_sec] [workers]
       [mem] [tmpmax_total]
A user-set GRAFT_DUCK_MEM / GRAFT_DUCK_TMPMAX in the environment wins
over the defaults; tmpmax_total (default 60GB) is divided across the
workers so N spilling oracles can't jointly fill the disk.
Exit 1 only on a real FAIL (capacity events are oracle limitations).
"""
import json
import os
import subprocess
import sys


def main(sf_dir, out_dir, budget=600, workers=6, mem="12GB",
         tmpmax_total_gb=60):
    here = os.path.dirname(os.path.abspath(__file__))
    # resolve BEFORE building symlink targets: a relative out_dir would
    # make the links stored in {out_dir}_shard{w}/ resolve relative to
    # the SHARD dir (vout_shard0/vout/q_x) and every dump read FAIL
    out_dir = os.path.abspath(out_dir)
    sf_dir = os.path.abspath(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    eps_path = f"{out_dir}/oracle_epsilon.json"
    eps_json = open(eps_path).read() if os.path.exists(eps_path) else None
    shard_dirs = []
    for w in range(workers):
        sd = f"{out_dir}_shard{w}"
        os.makedirs(sd, exist_ok=True)
        sub = {n: oracle[n] for i, n in enumerate(names)
               if i % workers == w}
        with open(f"{sd}/oracle_sql.json", "w") as f:
            json.dump(sub, f)
        if eps_json is not None:
            with open(f"{sd}/oracle_epsilon.json", "w") as f:
                f.write(eps_json)
        for n in sub:
            link = f"{sd}/{n}"
            if not os.path.islink(link):
                os.symlink(f"{out_dir}/{n}", link)
        shard_dirs.append(sd)
    # env contract: an existing GRAFT_DUCK_MEM/TMPMAX wins over the
    # defaults (setdefault); the per-worker spill cap divides the total
    # so 6 workers can't jointly spill 6 × the single-worker cap
    per_worker_tmp = f"{max(1, tmpmax_total_gb // workers)}GB"
    procs = []
    for w, sd in enumerate(shard_dirs):
        env = dict(os.environ, GRAFT_DUCK_TMP=f"/tmp/duck_tmp_w{w}")
        env.setdefault("GRAFT_DUCK_MEM", mem)
        env.setdefault("GRAFT_DUCK_TMPMAX", per_worker_tmp)
        logf = open(f"{sd}/replay.log", "w")
        procs.append((subprocess.Popen(
            [sys.executable, f"{here}/check_budget.py",
             sf_dir, sd, str(budget)],
            stdout=logf, stderr=subprocess.STDOUT, env=env), logf, sd))
    rc = 0
    n_pass = n_fail = n_cap = 0
    for p, logf, sd in procs:
        p.wait()
        logf.close()
        for line in open(f"{sd}/replay.log"):
            line = line.rstrip()
            if line.startswith("PASS "):
                n_pass += 1
            elif line.startswith("FAIL "):
                n_fail += 1
                print(line, flush=True)
            elif line.startswith("CAPACITY "):
                n_cap += 1
                print(line, flush=True)
        if p.returncode not in (0, 1):
            print(f"worker {sd} exited {p.returncode}", flush=True)
            rc = 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_cap} capacity")
    return 1 if n_fail else rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 600,
                  int(sys.argv[4]) if len(sys.argv) > 4 else 6,
                  sys.argv[5] if len(sys.argv) > 5 else "12GB",
                  int(sys.argv[6]) if len(sys.argv) > 6 else 60))
