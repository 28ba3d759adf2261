"""Report the last driver-CORRECTNESS stamp round for every registered query.

The driver grades only the first 50 registered queries each round (the
GRADE_FIRST window in ``__spark_entry__``), so external evidence for the
other ~225 ages until the window rotates back to them. This tool computes,
from the committed ``CORRECTNESS_r*.json`` artifacts, each query's most
recent green stamp — the input the rotation needs every round.

Usage:
    python tools/stamp_age.py              # table, oldest first
    python tools/stamp_age.py --json       # {"query": last_round, ...}
    python tools/stamp_age.py --backlog N  # only queries stamped <= round N

A query with no stamp at all is shown as round 0; the five rows-only
sketch/BPE entries (no oracle by design) are expected there and are
annotated. tests/test_stamp_age.py wraps this as a freshness guard.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Rows-only by design (sketch internals / BPE token ids): never in the
# graded window, covered by pytest numeric invariants + the self-sweep —
# and, since r14, each one ALSO has an oracle-paired verdict twin in the
# registry (es_cardinality_tol / stats_quantiles_kll_rank /
# emb_kmeans_recall / corpus_bpe_bounds). es_theta_set_ops left this set
# in r14: its sub-4096 exact mode pairs against plain COUNT(DISTINCT).
ROWS_ONLY = frozenset(
    {
        "es_cardinality_approx",
        "stats_quantiles_kll",
        "emb_kmeans_ivf_topk",
        "corpus_bpe_encode",
    }
)


def current_round() -> int:
    rounds = [
        int(re.search(r"_r(\d+)\.json$", f).group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    return max(rounds) if rounds else 0


def last_stamps() -> dict[str, int]:
    """query -> most recent round whose driver artifact graded it green."""
    stamps: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for name, rec in json.load(open(f)).items():
            if isinstance(rec, dict) and rec.get("err") is None:
                stamps[name] = max(stamps.get(name, 0), rnd)
    return stamps


def registered() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    return list(entrymod.queries().keys())


def ages() -> dict[str, int]:
    stamps = last_stamps()
    return {q: stamps.get(q, 0) for q in registered()}


def main() -> None:
    args = sys.argv[1:]
    a = ages()
    if "--json" in args:
        print(json.dumps(a, sort_keys=True))
        return
    cutoff = None
    if "--backlog" in args:
        cutoff = int(args[args.index("--backlog") + 1])
    rows = sorted(a.items(), key=lambda kv: (kv[1], kv[0]))
    cur = current_round()
    shown = 0
    for q, rnd in rows:
        if cutoff is not None and rnd > cutoff:
            continue
        note = "  (rows-only by design)" if q in ROWS_ONLY else ""
        print(f"r{rnd:02d}  age={cur - rnd:2d}  {q}{note}")
        shown += 1
    from collections import Counter

    hist = Counter(a.values())
    print(
        f"-- {shown} shown / {len(a)} registered; current round r{cur}; "
        f"stamp-round histogram: {dict(sorted(hist.items()))}"
    )


if __name__ == "__main__":
    main()
