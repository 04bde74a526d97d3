#!/usr/bin/env python3
"""Sharded driver for check_budget.py — the deep-scale (sf10) full-suite
oracle replay. Splits oracle_sql.json into N shards (round-robin over
the sorted names so heavy oracles spread out), builds per-shard dirs of
symlinks into the real verify dump, and runs N check_budget workers in
parallel, each with its own DuckDB temp dir and memory cap (the
GRAFT_DUCK_TMP / GRAFT_DUCK_MEM env contract added in r15). Merges the
per-shard verdict lines and prints one combined tally.

CAPACITY rows from the sharded pass are AUTO-RETRIED inside this same
invocation: each re-runs SOLO (no sibling workers) with the full memory
pool and a stretched budget — the exact manual procedure that recovered
all 7 shard-cap artifacts in r16, now mechanized so a full-suite replay
is one command with zero human retries. Recovered rows count PASS and
are listed as `shard_capacity_recovered` in {out_dir}/replay_summary.json;
only rows that stay CAPACITY at full memory remain CAPACITY.

Usage: check_budget_par.py <sfDir> <verifyOutDir> [budget_sec] [workers]
       [mem] [tmpmax_total]
A user-set GRAFT_DUCK_MEM / GRAFT_DUCK_TMPMAX in the environment wins
over the defaults; tmpmax_total (default 60GB) is divided across the
workers so N spilling oracles can't jointly fill the disk. The solo
retry pass uses GRAFT_DUCK_RETRY_MEM / GRAFT_DUCK_RETRY_TMPMAX
(defaults 50GB / 45GB) and 3× the budget (min 1800s).
Exit 1 only on a real FAIL (capacity events are oracle limitations).
"""
import json
import os
import subprocess
import sys


def relink(sd, names, out_dir):
    # Unconditionally recreate the dump symlinks: a stale link left by
    # an earlier run with a relative out_dir (resolving inside the
    # shard dir) would keep every dump read failing if merely skipped.
    for n in names:
        link = f"{sd}/{n}"
        if os.path.islink(link):
            os.remove(link)
        os.symlink(f"{out_dir}/{n}", link)


def tally(log_path):
    verdicts = {}
    for line in open(log_path):
        line = line.rstrip()
        for status in ("PASS", "FAIL", "CAPACITY"):
            if line.startswith(status + " "):
                name = line.split()[1].rstrip(":")
                verdicts[name] = (status, line)
    return verdicts


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

    def make_shard(sd, sub):
        os.makedirs(sd, exist_ok=True)
        with open(f"{sd}/oracle_sql.json", "w") as f:
            json.dump(sub, f)
        if eps_json is not None:
            with open(f"{sd}/oracle_epsilon.json", "w") as f:
                f.write(eps_json)
        relink(sd, sub, out_dir)

    shard_dirs = []
    for w in range(workers):
        sd = f"{out_dir}_shard{w}"
        sub = {n: oracle[n] for i, n in enumerate(names)
               if i % workers == w}
        make_shard(sd, sub)
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
    verdicts = {}
    for p, logf, sd in procs:
        p.wait()
        logf.close()
        verdicts.update(tally(f"{sd}/replay.log"))
        if p.returncode not in (0, 1):
            print(f"worker {sd} exited {p.returncode}", flush=True)
            rc = 1

    # ---- solo retry of shard-pass CAPACITY rows, full memory pool ----
    capacity = sorted(n for n, (s, _) in verdicts.items()
                      if s == "CAPACITY")
    recovered = []
    if capacity:
        retry_budget = max(budget * 3, 1800)
        rd = f"{out_dir}_retry"
        make_shard(rd, {n: oracle[n] for n in capacity})
        env = dict(os.environ, GRAFT_DUCK_TMP="/tmp/duck_tmp_retry")
        env["GRAFT_DUCK_MEM"] = os.environ.get(
            "GRAFT_DUCK_RETRY_MEM", "50GB")
        env["GRAFT_DUCK_TMPMAX"] = os.environ.get(
            "GRAFT_DUCK_RETRY_TMPMAX", "45GB")
        print(f"-- retrying {len(capacity)} capacity row(s) solo at "
              f"{env['GRAFT_DUCK_MEM']} / budget {retry_budget}s",
              flush=True)
        with open(f"{rd}/replay.log", "w") as logf:
            subprocess.run(
                [sys.executable, f"{here}/check_budget.py",
                 sf_dir, rd, str(retry_budget)],
                stdout=logf, stderr=subprocess.STDOUT, env=env)
        for n, (status, line) in tally(f"{rd}/replay.log").items():
            if status == "PASS":
                recovered.append(n)
            verdicts[n] = (status, line + " [solo retry]")

    n_pass = n_fail = n_cap = 0
    for n in sorted(verdicts):
        status, line = verdicts[n]
        if status == "PASS":
            n_pass += 1
        elif status == "FAIL":
            n_fail += 1
            print(line, flush=True)
        else:
            n_cap += 1
            print(line, flush=True)
    summary = {
        "pass": n_pass, "fail": n_fail, "capacity": n_cap,
        "shard_capacity_recovered": sorted(recovered),
        "still_capacity": sorted(n for n, (s, _) in verdicts.items()
                                 if s == "CAPACITY"),
        "manual_retries": 0,
    }
    with open(f"{out_dir}/replay_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    if recovered:
        print(f"-- recovered {len(recovered)} capacity row(s) solo: "
              + ", ".join(sorted(recovered)), flush=True)
    print(f"== {n_pass} pass, {n_fail} fail, {n_cap} capacity")
    return 1 if n_fail else rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 600,
                  int(sys.argv[4]) if len(sys.argv) > 4 else 6,
                  sys.argv[5] if len(sys.argv) > 5 else "12GB",
                  int(sys.argv[6]) if len(sys.argv) > 6 else 60))
