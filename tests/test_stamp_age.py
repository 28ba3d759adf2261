"""Evidence-freshness guard (VERDICT r10 item 6): the driver grades only
the first 50 registered queries per round, so every other query's external
correctness stamp ages until the GRADE_FIRST window rotates back to it.
These tests make the rotation self-maintaining — a round that forgets to
rotate fails here, with the exact queries named.

Policy (the r10 judge's rotation contract):
- the window must absorb the OLDEST-stamped backlog first: no stale query
  outside the window may be strictly older than a stale query inside it;
- when the stale backlog (stamp age > 6 rounds) is larger than the window
  can hold, the window must still dedicate >= 35 slots to it — capped by
  the slots actually free after the round's pins and its NEVER-stamped
  newcomers (a first stamp outranks a refresh: a new operator with no
  external correctness evidence is a bigger grading hole than a query
  last proven 7 rounds ago, and the derivation orders them so);
- GRADE_FIRST is exactly 50 (the graded prefix) and only names registered
  oracle-paired queries.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tools import stamp_age

STALE_AGE = 6
MIN_BACKLOG_SLOTS = 35


def _ages():
    return stamp_age.ages()


def test_grade_first_is_exactly_the_graded_prefix():
    assert len(entrymod.GRADE_FIRST) == 50
    assert len(set(entrymod.GRADE_FIRST)) == 50
    qs = entrymod.queries()
    missing = [k for k in entrymod.GRADE_FIRST if k not in qs]
    assert not missing, f"GRADE_FIRST names unregistered queries: {missing}"
    oracles = entrymod.oracle_sql()
    rows_only = [k for k in entrymod.GRADE_FIRST if k not in oracles]
    assert not rows_only, (
        f"GRADE_FIRST contains rows-only queries (would grade as"
        f" err:no_oracle): {rows_only}"
    )


def test_window_prioritizes_oldest_stamps():
    """No stale query OUTSIDE the window may be strictly older than one
    inside it — the rotation must consume the backlog oldest-first."""
    ages = _ages()
    window = set(entrymod.GRADE_FIRST)
    cur = stamp_age.current_round()
    stale = {
        q: r
        for q, r in ages.items()
        if q not in stamp_age.ROWS_ONLY and r and cur - r > STALE_AGE
    }
    inside = [r for q, r in stale.items() if q in window]
    outside = [r for q, r in stale.items() if q not in window]
    if inside and outside:
        skipped = sorted(
            q for q, r in stale.items() if q not in window and r < max(inside)
        )
        assert min(outside) >= max(inside), (
            "window skipped older-stamped queries than it includes:"
            f" {skipped[:10]}"
        )


def test_window_absorbs_enough_backlog():
    ages = _ages()
    window = set(entrymod.GRADE_FIRST)
    cur = stamp_age.current_round()
    stale = [
        q
        for q, r in ages.items()
        if q not in stamp_age.ROWS_ONLY and r and cur - r > STALE_AGE
    ]
    absorbed = sum(1 for q in stale if q in window)
    # slots not available to the backlog: the round's pinned paths and
    # the never-stamped newcomers (their FIRST stamp takes priority)
    oracles = entrymod.oracle_sql()
    newcomers = [
        q
        for q, r in ages.items()
        if r == 0 and q not in stamp_age.ROWS_ONLY and q in oracles
    ]
    free = len(entrymod.GRADE_FIRST) - len(entrymod.PIN_FIRST) - len(
        newcomers
    )
    need = min(MIN_BACKLOG_SLOTS, len(stale), free)
    assert absorbed >= need, (
        f"stale backlog = {len(stale)} but window absorbs only {absorbed}"
        f" (need >= {need}: {len(newcomers)} newcomers +"
        f" {len(entrymod.PIN_FIRST)} pins leave {free} free); oldest"
        f" missing:"
        f" {sorted((ages[q], q) for q in stale if q not in window)[:10]}"
    )


def test_never_stamped_is_exactly_the_rows_only_set():
    """A query with NO stamp must be rows-only by design; a new
    oracle-paired registration that never enters the window shows up
    here."""
    ages = _ages()
    never = {q for q, r in ages.items() if r == 0}
    unexplained = never - stamp_age.ROWS_ONLY - set(entrymod.GRADE_FIRST)
    assert not unexplained, (
        "oracle-paired queries with no driver stamp and not scheduled in"
        f" this round's window: {sorted(unexplained)}"
    )
