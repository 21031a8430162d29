#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines per query, flagging real regressions.

Usage: bench_compare.py OLD.json NEW.json [--threshold 1.5]

Accepts either a raw bench line, a line prefixed with sbt's "[info]", or a
driver BENCH_r*.json wrapper (bench line embedded in its "tail" field).
Host noise on this box is large (entire runs shift 1.5-2x with tenancy),
so absolute totals are not comparable across sessions; the useful signal
is per-query time RELATIVE to the run's own median. A query is flagged
only when its normalized time grew by more than --threshold.
"""
import json
import re
import statistics
import sys


def load(path):
    raw = open(path).read()
    try:
        wrapper = json.loads(raw)
        if isinstance(wrapper, dict) and "queries" in wrapper:
            return wrapper
        if isinstance(wrapper, dict) and "tail" in wrapper:
            m = re.search(r'\{"metric".*', wrapper["tail"])
            if m is None:
                sys.exit(f"no bench metric line found in {path}")
            raw = m.group(0).split("\n")[0]
    except json.JSONDecodeError:
        pass
    line = re.sub(r"^\[info\]\s*", "", raw.strip().splitlines()[-1])
    return json.loads(line)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    oq = {k: v for k, v in old["queries"].items() if v >= 0}
    nq = {k: v for k, v in new["queries"].items() if v >= 0}
    # medians over the INTERSECTION only: a driver-captured map holds just
    # the slowest-N queries while BENCH_local.json holds all of them, so
    # whole-file medians are not comparable (a 52-vs-198 pairing shifts
    # the median ~4x and flags every shared query as a regression)
    shared = set(oq) & set(nq)
    if not shared:
        sys.exit("no shared queries between the two runs")
    om = statistics.median(oq[k] for k in shared)
    nm = statistics.median(nq[k] for k in shared)
    print(f"old total {old['value']:.1f}s ({len(oq)} queries; "
          f"median over {len(shared)} shared: {om:.2f}s)")
    print(f"new total {new['value']:.1f}s ({len(nq)} queries; "
          f"median over shared: {nm:.2f}s)")
    failed = [k for k, v in new["queries"].items() if v < 0]
    for k in failed:
        print(f"FAILED  {k}")
    # per-query within-run spread (max/min across the bench's three
    # pass orders) is the noise yardstick: a cross-run ratio within a
    # run's OWN spread is host noise, not code. Runs older than the
    # three-pass bench carry no "spread" key -> yardstick 1.0.
    ospread = old.get("spread", {})
    nspread = new.get("spread", {})
    regressions, noise = [], []
    for k in sorted(set(oq) & set(nq)):
        ratio = (nq[k] / nm) / (oq[k] / om)
        if ratio > thr:
            yard = max(ospread.get(k, 1.0), nspread.get(k, 1.0), 1.0)
            (noise if ratio <= yard else regressions).append((ratio, k, yard))
    for ratio, k, yard in sorted(regressions, reverse=True):
        print(f"REGRESS {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s "
              f"({ratio:.2f}x vs median drift, beyond own spread {yard:.2f}x)")
    for ratio, k, yard in sorted(noise, reverse=True):
        print(f"NOISE   {k}: {oq[k]:.2f}s -> {nq[k]:.2f}s "
              f"({ratio:.2f}x, within within-run spread {yard:.2f}x)")
    added = sorted(set(nq) - set(oq))
    if added:
        print("new queries:", ", ".join(f"{k}={nq[k]:.2f}s" for k in added))
    if not regressions and not failed:
        print("OK: no per-query regression beyond "
              f"{thr}x median-normalized drift")
    sys.exit(len(regressions) + len(failed))


if __name__ == "__main__":
    main()
