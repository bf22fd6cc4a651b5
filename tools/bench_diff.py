"""Mechanical round-over-round bench comparison.

Reads two bench JSON files (BENCH_DETAIL.json-shaped: {"queries":
{name: sec, ...}, optional "host_start"/"host_end" stamps) and prints
the per-query ratio table the r5 verdict hand-rolled: new/old sorted
worst-first, flagging ratios past the threshold. With host stamps
present, prints the steal indicators first so a contended run is
discounted BEFORE anyone reads a 5x "regression" off it (the r5
q54-q66 class: zero code changes, ~4x co-tenant steal).

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold=1.5]
Exit 0 always — this is a report, not a gate; regressions need a
human (or judge) to adjudicate against code changes.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    for label, d in (("old", old), ("new", new)):
        hs, he = d.get("host_start"), d.get("host_end")
        if hs or he:
            nr = d.get("n_runs")
            tag_extra = f" (session-min over {nr} runs)" if nr else ""
            print(f"[{label}] host stamps{tag_extra}:")
            for tag, h in (("start", hs), ("end", he)):
                if h:
                    print(
                        f"  {tag}: loadavg_1m={h.get('loadavg_1m')} "
                        f"calib_sec={h.get('calib_sec')} ncpus={h.get('ncpus')}"
                    )
            for i, r in enumerate(d.get("runs") or []):
                print(
                    f"  run {i + 1}: total={r.get('value')}s "
                    f"calib={r['host_start'].get('calib_sec')}/"
                    f"{r['host_end'].get('calib_sec')} "
                    f"load={r['host_start'].get('loadavg_1m')}/"
                    f"{r['host_end'].get('loadavg_1m')}"
                )
    oq, nq = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(oq) & set(nq))
    rows = []
    for name in common:
        a, b = oq[name], nq[name]
        ratio = (b / a) if a > 0 else float("inf")
        rows.append((ratio, name, a, b))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > thr]
    print(f"\n{len(common)} common queries; {len(flagged)} past {thr}x:")
    print(f"{'query':40s} {'old_s':>8s} {'new_s':>8s} {'ratio':>7s}")
    for ratio, name, a, b in rows:
        mark = "  <-- FLAG" if ratio > thr else ""
        print(f"{name:40s} {a:8.3f} {b:8.3f} {ratio:6.2f}x{mark}")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print(f"\nonly in old: {only_old}")
    if only_new:
        print(f"only in new: {only_new}")
    med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else 0.0
    print(f"\nmedian ratio: {med:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
