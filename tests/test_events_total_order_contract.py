"""The events total-order contract: ``event_id`` is unique (and so is
``(ts, event_id)``) — tripwired, with the r15 probe result recorded.

Every event-window query makes its ORDER BY total with the
``(ts, event_id)`` tiebreak; totality is what makes the DuckDB hash
compare deterministic. An r15 probe duplicated one ``(ts, event_id)``
pair with a DIFFERENT value and ran the 16 most tie-sensitive window/
session/as-of/streaming queries: ALL GREEN — but inspection shows the
green is SHARED SOURCE ORDER, not structure. At the tie boundary a
ROWS frame (e.g. moving_avg_7's ``6 PRECEDING``) sees a different
multiset depending on which tied row sorts first, so two engines (or
one engine under a different partitioning) may legitimately disagree.
Unlike the doc_id-duplication axis (structurally tie-insensitive,
pinned green in test_hostile_docs_dupid.py), this agreement is NOT
guaranteed — so the contract is pinned instead: the driver data keeps
event_id unique at every sf, and this tripwire fires before any tied
ROWS frame can surface as a confusing oracle mismatch.
"""

from __future__ import annotations

import glob

import duckdb


def test_driver_events_have_unique_event_ids():
    con = duckdb.connect()
    dirs = sorted(glob.glob("/root/testdata/sf*"))
    assert dirs, "driver testdata missing"
    for d in dirs:
        p = f"{d}/events.parquet"
        n, n_id = con.execute(
            f"SELECT count(*), count(DISTINCT event_id) FROM '{p}'"
        ).fetchone()
        assert n == n_id, (
            f"{p}: {n - n_id} duplicate event_ids — the window "
            "families' (ts, event_id) total order is no longer total; "
            "tied ROWS frames are engine/partitioning-dependent"
        )
