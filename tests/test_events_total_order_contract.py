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
    """``count(DISTINCT event_id)`` EXCLUDES NULLs, so ``n == n_id``
    proves two things at once: no duplicate ids AND no null ids
    (a single NULL would make n_id < n). The second half is
    load-bearing (r15 ADVICE): the event_id/o_orderkey TIEBREAK keys
    in WINDOW_DELTAS_SQL / MOVING_AVG_SQL / ZSCORE_ANOMALY_SQL are
    deliberately NOT annotated NULLS FIRST (only the primary ts/value
    keys are), so a null id would re-open the nullable-ORDER-BY
    divergence class — this tripwire fires on it first. The NULLS
    FIRST respell of those tiebreak keys is scheduled with their
    owners' drain round (they are r15-vintage; annotating them now
    would front three queries for a purely cosmetic change)."""
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


def test_driver_tpch_tables_have_unique_primary_keys():
    """The same total-order contract on the TPC-H side: keep-first
    dedup, SCD2 versioning and the gaps-and-islands runs all
    tiebreak on o_orderkey. A duplicated key would make those ties
    engine/partitioning-dependent exactly like a duplicated event_id,
    so pin the uniqueness the queries assume.

    Deliberately NOT pinned: lineitem's TPC-H composite
    ``(l_orderkey, l_linenumber)`` — writing this tripwire found the
    driver's synthetic lineitem carries DUPLICATE composites (1401 at
    sf0.001), i.e. it is a fact table, not a keyed one, in this
    testdata. No registered query assumes that composite is unique
    (lineitem only flows through aggregations and orderkey equi-joins,
    both duplicate-safe); any future query that wants a lineitem
    keep-first/window MUST build its own total order."""
    con = duckdb.connect()
    pks = {
        "orders": "o_orderkey",
        "customer": "c_custkey",
        "part": "p_partkey",
        "supplier": "s_suppkey",
        "nation": "n_nationkey",
        "region": "r_regionkey",
    }
    for d in sorted(glob.glob("/root/testdata/sf*")):
        for t, pk in pks.items():
            p = f"{d}/{t}.parquet"
            n, n_pk = con.execute(
                f"SELECT count(*), count(DISTINCT {pk}) FROM '{p}'"
            ).fetchone()
            assert n == n_pk, f"{p}: {n - n_pk} duplicate {pk}"
