#!/usr/bin/env python3
"""Assemble DEEPSCALE_r{N}.json from TimeProbe logs at two scales.

Usage: deepscale_report.py <round> <small_log> <small_sf> <big_log...> <big_sf>
Reads `[time] <q> passK <sec> s` lines; per query takes pass1 (cold,
includes standing-store builds) and pass2 (warm serving) where present.
The wall-growth exponent is log(w_big/w_small) / log(sf_big/sf_small),
computed per pass tier — <1 sublinear, ~1 linear in data volume.
Prints the JSON report to stdout (caller redirects into the repo).
"""
import json
import math
import re
import sys


def parse(paths):
    out = {}
    for path in paths:
        for line in open(path):
            m = re.match(r"\[time\] (\S+) pass(\d) ([\d.]+) s", line.strip())
            if m:
                out.setdefault(m.group(1), {})[f"pass{m.group(2)}"] = \
                    float(m.group(3))
    return out


def main():
    rnd = int(sys.argv[1])
    small = parse([sys.argv[2]])
    sf_small = float(sys.argv[3])
    big = parse(sys.argv[4:-1])
    sf_big = float(sys.argv[-1])
    ratio = sf_big / sf_small
    queries = {}
    for q in sorted(set(small) & set(big)):
        row = {}
        for p in ("pass1", "pass2"):
            if p in small[q] and p in big[q]:
                e = math.log(big[q][p] / small[q][p]) / math.log(ratio)
                row[p] = {
                    f"sf{sf_small:g}_sec": small[q][p],
                    f"sf{sf_big:g}_sec": big[q][p],
                    "growth_exponent": round(e, 3),
                }
        queries[q] = row
    print(json.dumps({"round": rnd,
                      "method": ("TimeProbe sequential walls at both "
                                 "scales; exponent = log(w_big/w_small)"
                                 "/log(data_ratio); pass1 = cold incl. "
                                 "standing-store builds, pass2 = warm "
                                 "serving"),
                      "data_ratio": ratio,
                      "queries": queries}, indent=2))


if __name__ == "__main__":
    main()
