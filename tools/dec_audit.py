#!/usr/bin/env python3
"""DECIMAL-in-hash audit (round 13, VERDICT r12 #2).

The driver's transport converts DECIMAL hashed columns to float64 on
one side and hashes the shortest-roundtrip float repr (see PROBES.md:
perfect separation over all 282 r12 outputs). A hashed DECIMAL value v
is HAZARDOUS iff str(v) != repr(float(v)) — i.e. trailing zeros at
scale, |v| < 1e-4, scale-0 rendering, or > ~17 significant digits.
Production gates must not hash decimals at all (digit-string witnesses
instead); diagnostic probes may, deliberately.

Usage: python3 tools/dec_audit.py <verifyOutDir> [--allow q1 q2 ...]

Scans every query parquet dumped by graft.Verify, lists DECIMAL
columns, classifies each against the hazard rule on the ACTUAL values,
and exits 1 if any non-allowlisted query exposes a DECIMAL column
(safe-valued or not — safety is data-dependent, the discipline is
type-level). The allowlist is the deliberate probe battery.
"""
import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# Probes that deliberately expose DECIMAL columns to fingerprint the
# driver transport. The four hazard-axis probes (trail18/tiny18/int0/
# sumtrail) confirmed the float-repr rule in round 13 and were retired
# in round 14 (PROBES.md "RETIREMENT"); what remains are the GREEN
# sentinels — safe-valued DECIMAL exposures that flip red only if the
# driver transport itself changes.
DELIBERATE = {
    "q_probe_decsum",
    "q_probe_dec_safe18", "q_probe_dec_safe38",
}


def hazard_values(vals):
    out = []
    for v in vals:
        if v is None:
            continue
        if str(v) != repr(float(v)):
            out.append(str(v))
    return out


def main():
    # ADVICE r13: guard bad invocations with usage + a distinct exit
    # code (2) so a mis-run is obvious in round automation rather than
    # an IndexError traceback.
    args = [a for a in sys.argv[1:] if a != "--allow"]
    if not args:
        print("usage: dec_audit.py <verifyOutDir> [--allow q1 q2 ...]")
        sys.exit(2)
    out_dir = sys.argv[1]
    if not os.path.isdir(out_dir):
        print(f"dec_audit.py: not a directory: {out_dir}")
        print("usage: dec_audit.py <verifyOutDir> [--allow q1 q2 ...]")
        sys.exit(2)
    allow = set(DELIBERATE)
    if "--allow" in sys.argv:
        allow |= set(sys.argv[sys.argv.index("--allow") + 1:])
    bad = []
    n_dec = 0
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if not os.path.isdir(p) or not glob.glob(p + "/*.parquet"):
            continue
        tab = pq.read_table(p)
        deccols = [f.name for f in tab.schema
                   if pa.types.is_decimal(f.type)]
        if not deccols:
            continue
        n_dec += 1
        hz = {c: hazard_values(tab.column(c).to_pylist())
              for c in deccols}
        hz = {c: v[:3] for c, v in hz.items() if v}
        tag = "DELIBERATE-PROBE" if d in allow else "VIOLATION"
        state = f"hazard-values {hz}" if hz else "safe-values-today"
        print(f"{tag}  {d}: decimal cols {deccols} ({state})")
        if d not in allow:
            bad.append(d)
    print(f"\n{n_dec} queries expose DECIMAL columns; "
          f"{len(bad)} outside the deliberate-probe allowlist")
    if bad:
        print("FAIL: migrate these to digit-string witnesses "
              "(cast(... as string) in Spark, CAST(... AS VARCHAR) "
              "in the oracle):", ", ".join(bad))
        sys.exit(1)
    print("PASS: no production gate hashes a DECIMAL column")


if __name__ == "__main__":
    main()
