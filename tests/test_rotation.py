"""Staleness-aware window rotation: the fingerprint must flip exactly
when code a query depends on changes (its own body, an intra-module
helper or SQL constant, or a transitively imported package module) and
stay put when an unrelated function in the same module changes."""

from __future__ import annotations

from etl_sales_pandas_sqlserver_spark.plans.rotation import (
    PACKAGE,
    Fingerprinter,
)

_MOD = f"{PACKAGE}.plans.fakemod"
_DEP = f"{PACKAGE}.operators.fakedep"

_DEP_SRC = "def helper(x):\n    return x + 1\n"

_MOD_SRC = f"""\
from ..operators.fakedep import helper

A_SQL = "SELECT 1 AS a"

def _shared(x):
    return helper(x)

def q_alpha(spark, sf):
    return _shared(1)

def q_beta(spark, sf):
    return 2
"""


def _reader(files):
    return lambda path: files.get(path)


def _files(mod_src=_MOD_SRC, dep_src=_DEP_SRC):
    return {
        f"{PACKAGE}/plans/fakemod.py": mod_src,
        f"{PACKAGE}/operators/fakedep.py": dep_src,
    }


def _fp(files, fn="q_alpha"):
    return Fingerprinter(_reader(files)).query_fingerprint(_MOD, fn)


def test_fingerprint_is_deterministic():
    assert _fp(_files()) == _fp(_files())
    assert _fp(_files()) is not None


def test_own_body_change_flips_fingerprint():
    changed = _MOD_SRC.replace("return _shared(1)", "return _shared(2)")
    assert _fp(_files()) != _fp(_files(mod_src=changed))


def test_unrelated_function_change_does_not_flip():
    # q_beta's body is outside q_alpha's reachability closure
    changed = _MOD_SRC.replace("return 2", "return 3")
    assert _fp(_files()) == _fp(_files(mod_src=changed))


def test_intra_module_helper_change_flips():
    changed = _MOD_SRC.replace("return helper(x)", "return helper(x) + 0")
    assert _fp(_files()) != _fp(_files(mod_src=changed))


def test_sql_constant_change_flips():
    # conservative by design: any module-level string constant counts
    changed = _MOD_SRC.replace("SELECT 1 AS a", "SELECT 2 AS a")
    assert _fp(_files()) != _fp(_files(mod_src=changed))


def test_dep_module_change_flips():
    changed_dep = _DEP_SRC.replace("x + 1", "x + 2")
    assert _fp(_files()) != _fp(_files(dep_src=changed_dep))


def test_dep_not_referenced_by_query_is_ignored():
    # q_beta never touches helper/fakedep: dep edits must not flip it
    changed_dep = _DEP_SRC.replace("x + 1", "x + 2")
    assert _fp(_files(), "q_beta") == _fp(_files(dep_src=changed_dep), "q_beta")


def test_missing_module_or_function_is_stale():
    assert Fingerprinter(_reader({})).query_fingerprint(_MOD, "q_alpha") is None
    assert _fp(_files(), "q_gone") is None


def test_registry_window_has_no_fresh_before_stale(monkeypatch):
    """End-to-end on the real registry + manifest: the first-50 window
    must never hold a fresh-evidence query while a stale one waits
    outside (the round-4 tpch_more failure mode)."""
    from etl_sales_pandas_sqlserver_spark.plans.rotation import (
        load_manifest,
        worktree_reader,
    )
    from etl_sales_pandas_sqlserver_spark.plans.testdata_queries import QUERIES

    manifest = load_manifest()
    if not manifest:
        import pytest

        pytest.skip("no rotation manifest in this tree")
    fper = Fingerprinter(worktree_reader)
    names = list(QUERIES)

    def is_fresh(name):
        fn = QUERIES[name][0]
        e = manifest.get(name)
        fp = fper.query_fingerprint(fn.__module__, fn.__qualname__)
        return bool(e and fp and e.get("fingerprint") == fp)

    def own_stale(name):
        """OWN code changed since the last green row (r11 tripwire).

        This is the high-risk evidence gap the window must always
        drain first. Dep-only staleness (full fingerprint moved, own
        closure identical) deliberately keeps vintage order — the
        round-7 re-rank: a busy round editing one shared module must
        not let its whole dep cohort starve the oldest-evidence drain.
        """
        fn = QUERIES[name][0]
        e = manifest.get(name)
        ofp = fper.query_own_fingerprint(fn.__module__, fn.__qualname__)
        if e is None or ofp is None:
            return True  # never green / unresolvable: must front
        green_own = e.get("own_fingerprint")
        head_own = e.get("head_own_fingerprint")
        return (green_own is not None and green_own != ofp) or (
            head_own is not None and head_own != ofp
        )

    # no-oracle (rows-only) queries are exempt: a window slot can only
    # record ``err: no_oracle`` for them, so they sort behind every
    # oracle-checkable query regardless of staleness (round-5 verdict);
    # their accuracy is covered by hash-checked contract queries.
    stale_outside = [
        n for n in names[50:] if QUERIES[n][1] is not None and own_stale(n)
    ]
    fresh_inside = [n for n in names[:50] if is_fresh(n)]
    assert not (stale_outside and fresh_inside), (
        f"fresh inside window {fresh_inside[:5]} while own-stale outside "
        f"{stale_outside[:5]}"
    )

    # and the window itself must never contain a no-oracle query while
    # any oracle-checkable query waits outside
    no_oracle_inside = [n for n in names[:50] if QUERIES[n][1] is None]
    oracle_outside = [n for n in names[50:] if QUERIES[n][1] is not None]
    assert not (no_oracle_inside and oracle_outside), (
        f"no-oracle query in window: {no_oracle_inside}"
    )


def test_manifest_tool_state_is_consistent():
    """The committed manifest must be regenerable state: every entry
    carries a last-green round no newer than the newest CORRECTNESS
    file, a fingerprint, and a head fingerprint for the
    changed-this-round tier."""
    import glob
    import os
    import re

    from etl_sales_pandas_sqlserver_spark.plans.rotation import load_manifest

    manifest = load_manifest()
    if not manifest:
        import pytest

        pytest.skip("no rotation manifest in this tree")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    ]
    assert rounds, "no correctness files but a manifest exists"
    newest = max(rounds)
    for name, entry in manifest.items():
        assert 1 <= entry["last_green_round"] <= newest, name
        assert entry.get("fingerprint"), name
        assert "head_fingerprint" in entry, name



def test_own_fingerprint_ignores_dep_module_changes():
    """Two-level staleness: editing a dep module flips the FULL
    fingerprint but not the OWN fingerprint; editing the query's own
    body flips both. (Round-6 lesson: one new loader function flooded
    the changed tier with the whole registry.)"""
    base = _files()
    changed_dep = _files(dep_src=_DEP_SRC.replace("x + 1", "x + 2"))
    changed_own = _files(mod_src=_MOD_SRC.replace("return _shared(1)", "return _shared(9)"))

    def fps(files):
        f = Fingerprinter(_reader(files))
        return (
            f.query_own_fingerprint(_MOD, "q_alpha"),
            f.query_fingerprint(_MOD, "q_alpha"),
        )

    own0, full0 = fps(base)
    own1, full1 = fps(changed_dep)
    own2, full2 = fps(changed_own)
    assert own0 == own1 and full0 != full1  # dep edit: full only
    assert own0 != own2 and full0 != full2  # own edit: both


def test_paired_sql_constant_flips_own_fingerprint_only_for_owner():
    """Registry-dict pairing: a query's own fingerprint covers exactly
    ITS oracle SQL constant -- editing it flips the owner's own
    fingerprint, while an unrelated query in the same module keeps its
    own fingerprint (only its full fingerprint flips, tier 2)."""
    mod = _MOD_SRC + '\nREG = {"alpha": (q_alpha, A_SQL)}\n'
    changed = mod.replace("SELECT 1 AS a", "SELECT 2 AS a")

    def fps(src, fn):
        f = Fingerprinter(_reader(_files(mod_src=src)))
        return (
            f.query_own_fingerprint(_MOD, fn),
            f.query_fingerprint(_MOD, fn),
        )

    own_a0, full_a0 = fps(mod, "q_alpha")
    own_a1, full_a1 = fps(changed, "q_alpha")
    assert own_a0 != own_a1 and full_a0 != full_a1  # owner: both flip

    own_b0, full_b0 = fps(mod, "q_beta")
    own_b1, full_b1 = fps(changed, "q_beta")
    assert own_b0 == own_b1  # non-owner own fp untouched
    assert full_b0 != full_b1  # but full fp conservatively flips


def test_manifest_is_fresh_against_newest_correctness():
    """Freshness tripwire (r10 verdict #2): the committed manifest must
    have been regenerated AFTER the newest CORRECTNESS_r{N}.json landed.
    A stale manifest silently mis-orders the driver window (it happened
    in r8 and again in r10: 152 entries on disk vs 166 registered).

    Two signals, both cheap:
      1. every green row of the newest round is present in the manifest
         with ``last_green_round == newest`` (a pre-round manifest would
         carry an older round for those names), and
      2. the manifest is not missing queries that have ANY green
         history (union of all rounds).
    """
    import glob
    import json
    import os
    import re

    from etl_sales_pandas_sqlserver_spark.plans.rotation import load_manifest

    manifest = load_manifest()
    if not manifest:
        import pytest

        pytest.skip("no rotation manifest in this tree")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = {
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1)): p
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    }
    assert files, "no correctness files but a manifest exists"
    newest = max(files)

    def green(path):
        rows = json.load(open(path))
        return {
            name
            for name, r in rows.items()
            if not r.get("err")
            and r.get("rows_match")
            and r.get("schema_match", True)
            and r.get("hash_match", True)
        }

    newest_green = green(files[newest])
    assert newest_green, f"round {newest} has no green rows?"
    stale = {
        n
        for n in newest_green
        if n not in manifest or manifest[n]["last_green_round"] != newest
    }
    assert not stale, (
        f"manifest predates CORRECTNESS_r{newest}.json — run "
        f"tools/update_rotation_manifest.py (stale: {sorted(stale)[:5]}…)"
    )

    union_green = set().union(*(green(p) for p in files.values()))
    missing = union_green - set(manifest)
    assert not missing, (
        f"manifest missing {len(missing)} ever-green queries: "
        f"{sorted(missing)[:5]}…"
    )
