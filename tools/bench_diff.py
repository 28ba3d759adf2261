"""Round-over-round bench regression report.

Compares two bench JSON files (driver ``BENCH_r{N}.json`` or self-measured
``BENCH_SELF_r{N}.json``) per query and flags slowdowns above a threshold —
the per-round discipline that caught the r2 `.rdd`-probe regression and the
r1→r3 psum timer-method delta (BASELINE.md attributions).

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold=1.5]
Exit 0 always (reporting tool; regressions are judged with BASELINE.md
context — bench noise at sub-second scale is real).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    # driver files hold one pretty-printed object; self files one JSON line
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = json.loads(text.splitlines()[-1])
    if "parsed" in d:  # driver wrapper: {n, rc, cpus, sf, tail, parsed}
        d = d["parsed"] or {}
    return d.get("queries", d)


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        return
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    slower, faster = [], []
    for q in common:
        a, b = float(old[q]), float(new[q])
        if a <= 0:
            continue
        r = b / a
        if r >= thr and b - a > 0.1:
            slower.append((r, q, a, b))
        elif r <= 1 / thr and a - b > 0.1:
            faster.append((r, q, a, b))
    tot_old = sum(float(old[q]) for q in common)
    tot_new = sum(float(new[q]) for q in common)
    print(
        f"{len(common)} common queries: total {tot_old:.1f}s -> {tot_new:.1f}s "
        f"({tot_new / tot_old:.2f}x)"
    )
    for label, rows in (("SLOWER", sorted(slower, reverse=True)),
                        ("faster", sorted(faster))):
        for r, q, a, b in rows:
            print(f"  {label} {r:5.2f}x  {q:32} {a:.3f} -> {b:.3f}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"  new queries: {', '.join(only_new)}")


if __name__ == "__main__":
    main()
