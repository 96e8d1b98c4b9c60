#!/usr/bin/env python3
"""Compare two graft.Bench JSON artifacts row by row.

Usage:
  python3 tools/bench_compare.py A.json B.json            # agreement check
  python3 tools/bench_compare.py 1x.json 10x.json --factor 10

Without --factor: prints per-row B/A ratios of medians and mins and flags
rows outside the 1.2x agreement band (the round-12/14 full-run artifact
trustworthiness criterion). With --factor N: treats B as the N-x-scale
artifact and flags rows whose median ratio exceeds ~1.2*N (super-linear on
fixed cores).

The artifact may be the last line of a log; any line that parses as JSON
with a "queries" key is accepted (last such line wins).
"""
import json
import re
import sys


def load(path):
    art = None
    with open(path) as f:
        content = f.read()
    for line in content.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in obj and isinstance(obj["queries"], dict):
            art = obj
    if art is None:
        # driver-written BENCH_rN.json wraps (and truncates) the bench line
        # in a "tail" string — recover the per-row objects and scalar calibs
        # by regex over the escaped content
        art = {}
        for key in ("queries", "mins"):
            m = re.search(r'\\"%s\\":\{(.*?)\}' % key, content)
            if m:
                art[key] = {k: float(v) for k, v in
                            re.findall(r'\\"([^"\\]+)\\":([0-9.]+)', m.group(1))}
        for key in ("calib", "calib_io", "calib_store", "calib_shuffle"):
            m = re.search(r'\\"%s\\":([0-9.]+)' % key, content)
            if m:
                art[key] = float(m.group(1))
        for key in ("window", "row_isolation"):
            m = re.search(r'\\"%s\\":\\"([a-z]+)\\"' % key, content)
            if m:
                art[key] = m.group(1)
    if not art.get("queries"):
        sys.exit(f"no bench JSON line found in {path}")
    return art


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    factor = 1.0
    for a in sys.argv[1:]:
        if a.startswith("--factor"):
            factor = float(a.split("=", 1)[1] if "=" in a else
                           sys.argv[sys.argv.index(a) + 1])
    a, b = load(args[0]), load(args[1])
    qa, qb = a["queries"], b["queries"]
    ma, mb = a.get("mins", {}), b.get("mins", {})
    ca, cb = a.get("row_calibs", {}), b.get("row_calibs", {})
    names = [n for n in qa if n in qb]
    missing = sorted(set(qa) ^ set(qb))
    band = 1.2 * factor
    print(f"{'row':28s} {'A_med':>8s} {'B_med':>8s} {'med_ratio':>9s} "
          f"{'A_min':>8s} {'B_min':>8s} {'min_ratio':>9s} {'calibs':>12s}")
    flagged = []
    for n in names:
        rm = qb[n] / qa[n] if qa[n] else float("inf")
        rmin = (mb[n] / ma[n]) if n in ma and n in mb and ma[n] else float("nan")
        # per-row LOCAL window evidence (fork-replicated artifacts): when
        # the two reporting children's calibrations diverge, the row's
        # disagreement is window, not code
        cal = (f"{ca[n]:.2f}/{cb[n]:.2f}" if n in ca and n in cb else "")
        mark = ""
        if rm > band:
            mark = " <== over band"
            flagged.append((n, rm))
        # for agreement mode the band is symmetric: a row 1.2x FASTER in B
        # is the same disagreement as 1.2x slower
        elif factor == 1.0 and rm < 1 / band:
            mark = " <== under band"
            flagged.append((n, rm))
        print(f"{n:28s} {qa[n]:8.3f} {qb[n]:8.3f} {rm:9.2f} "
              f"{ma.get(n, float('nan')):8.3f} {mb.get(n, float('nan')):8.3f} "
              f"{rmin:9.2f} {cal:>12s}{mark}")
    for w in (a, b):
        print(f"window={w.get('window')} axes={w.get('degraded_axes')} "
              f"calib={w.get('calib')} io={w.get('calib_io')} "
              f"store={w.get('calib_store')} shuffle={w.get('calib_shuffle')} "
              f"iso={w.get('row_isolation')} sf={w.get('sf')}")
    if missing:
        print(f"rows only in one artifact: {missing}")
    n_band = f"{band:.1f}x"
    if flagged:
        print(f"FLAGGED ({len(flagged)} rows outside {n_band}): "
              + ", ".join(f"{n}={r:.2f}" for n, r in flagged))
        sys.exit(1)
    print(f"OK: all {len(names)} shared rows within {n_band}")


if __name__ == "__main__":
    main()
