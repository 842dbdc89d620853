"""Regenerate ``plans/_rotation_manifest.json`` — run at ROUND START.

For every query in the registry, find its newest green row across all
``CORRECTNESS_r*.json`` files, map that round to the git commit the
driver actually verified (the parent of the ``round N: verdict...``
marker commit), and record the query's code fingerprint AT THAT COMMIT.
At registry import time ``plans/rotation.py`` compares these against
worktree fingerprints: any mismatch means the query's code changed
after its last green driver row, so it is rotated to the head of the
50-query correctness window.

Usage: python tools/update_rotation_manifest.py   (from the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_sales_pandas_sqlserver_spark.plans.rotation import (  # noqa: E402
    MANIFEST_PATH,
    Fingerprinter,
)


def round_commits() -> dict[int, str]:
    """round number -> commit hash of the tree the driver verified."""
    log = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H %s"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    out: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            n = int(m.group(1))
            parent = subprocess.run(
                ["git", "-C", REPO, "rev-parse", f"{sha}^"],
                capture_output=True,
                text=True,
                check=True,
            ).stdout.strip()
            out.setdefault(n, parent)
    return out


def _is_green(row: dict) -> bool:
    """A row counts as verified evidence if the full oracle compare
    passed, or -- for rows-only queries (no oracle by design) -- the
    weaker non-empty-result check passed."""
    if row.get("err") == "no_oracle":
        return bool(row.get("spark_rows"))
    return bool(
        row.get("rows_match")
        and row.get("schema_match", True) is not False
        and row.get("hash_match", True) is not False
        and not row.get("err")
    )


def green_rounds() -> dict[str, int]:
    """query name -> newest round with a green driver row."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if _is_green(row) and rnd > last.get(name, 0):
                last[name] = rnd
    return last


def git_reader(commit: str):
    cache: dict[str, str | None] = {}

    def read(path: str) -> str | None:
        if path not in cache:
            p = subprocess.run(
                ["git", "-C", REPO, "show", f"{commit}:{path}"],
                capture_output=True,
                text=True,
            )
            cache[path] = p.stdout if p.returncode == 0 else None
        return cache[path]

    return read


def main() -> int:
    from etl_sales_pandas_sqlserver_spark.plans.testdata_queries import QUERIES

    commits = round_commits()
    greens = green_rounds()
    readers = {n: Fingerprinter(git_reader(c)) for n, c in commits.items()}
    head_round = max(commits) if commits else None
    manifest: dict[str, dict] = {}
    missing_commit = sorted(set(greens.values()) - set(commits))
    if missing_commit:
        print(f"WARNING: no marker commit for rounds {missing_commit}; "
              "their green rows are ignored", file=sys.stderr)
    for name, (fn, _sql) in QUERIES.items():
        rnd = greens.get(name)
        while rnd and rnd not in readers:
            rnd = max((r for r in greens_all_rounds(name) if r in readers and r < rnd), default=None)
        if not rnd:
            continue  # never green (or unverifiable round): stays stale
        fp = readers[rnd].query_fingerprint(fn.__module__, fn.__qualname__)
        if not fp:
            # the function cannot be resolved at the verified commit
            # (renamed/refactored since): the green row is evidence for
            # code we can no longer identify, so record nothing -- the
            # runtime treats the query as never-verified and fronts it
            continue
        manifest[name] = {
            "last_green_round": rnd,
            "fingerprint": fp,
            # own (intra-module closure) fingerprint at the verified
            # commit: lets the runtime front queries whose OWN code
            # changed since their last green row even when the change
            # landed in an EARLIER round (r11 fix — six r8-green
            # traindata/dedup/cluster_ops queries had own-code edits
            # from r9 that never re-verified because only
            # changed-THIS-round was tier-1)
            "own_fingerprint": readers[rnd].query_own_fingerprint(
                fn.__module__, fn.__qualname__
            ),
        }
        if head_round is not None:
            # fingerprints at the LATEST verified commit: let the
            # runtime distinguish "own code changed this round"
            # (highest re-verify priority) from "a shared dep module
            # changed" from merely stale-since-last-green
            manifest[name]["head_fingerprint"] = readers[
                head_round
            ].query_fingerprint(fn.__module__, fn.__qualname__)
            manifest[name]["head_own_fingerprint"] = readers[
                head_round
            ].query_own_fingerprint(fn.__module__, fn.__qualname__)
    with open(MANIFEST_PATH, "w") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    n_known = len(manifest)
    print(f"wrote {MANIFEST_PATH}: {n_known}/{len(QUERIES)} queries with "
          f"green history across rounds {sorted(commits)}")
    return 0


def greens_all_rounds(name: str) -> list[int]:
    """All green rounds for one query (fallback when the newest green
    round has no marker commit)."""
    out = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rows = json.load(f)
        row = rows.get(name)
        if row and _is_green(row):
            out.append(int(m.group(1)))
    return out


if __name__ == "__main__":
    raise SystemExit(main())
