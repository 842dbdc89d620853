"""Staleness-aware ordering of the query registry.

The driver's per-round correctness run covers only the FIRST 50
registered queries, while the registry holds ~2x that. Round 4's
verdict flagged the failure mode: a query's code can change AFTER its
last green driver row, and if it sits outside the window the stale
evidence accumulates silently (it happened to the four ``tpch_more``
queries in round 4). This module makes the window rotation automatic:

  sort key = (fresh-evidence ASC, last_green_round ASC, name)

i.e. queries whose code changed since their last green row (or that
never had one) come FIRST, then everything else oldest-evidence-first,
so every query re-verifies at worst every ceil(N/50) rounds.

"Code changed" is decided by a per-query FINGERPRINT that both the
runtime (against the worktree) and ``tools/update_rotation_manifest.py``
(against the git commit of the query's last green round) can compute
from nothing but file contents:

  sha256 of
    - the source segment of the query function in its defining module,
    - the intra-module closure of module-level defs it references
      (helpers like ``_ts_lit`` -- the round-4 miss -- are therefore
      part of the hash), plus ALL module-level string-constant
      assignments (the oracle SQL lives there),
    - the full source of every package-internal module transitively
      imported, symbol-filtered at the first hop (a module gaining an
      import only marks the functions that USE the new symbol stale).

Known coarseness, chosen deliberately: editing one SQL constant marks
the whole module's queries stale (conservative, rare); dep modules are
hashed whole (a change to ``operators/dates.py`` re-verifies every
query that reaches it -- that is the point).

The manifest (``_rotation_manifest.json``, one entry per query:
``{"last_green_round": N, "fingerprint": "..."}``) is regenerated at
the START of each round by ``tools/update_rotation_manifest.py`` once
the new ``CORRECTNESS_r*.json`` exists. With no manifest on disk the
registry keeps its static registration order.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
from typing import Callable

PACKAGE = "etl_sales_pandas_sqlserver_spark"

#: repo root = parent of the package directory
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_rotation_manifest.json"
)

#: reader: repo-relative posix path -> source text, or None if absent
Reader = Callable[[str], "str | None"]


def worktree_reader(path: str) -> str | None:
    full = os.path.join(_REPO_ROOT, path)
    if not os.path.isfile(full):
        return None
    with open(full, "r", encoding="utf-8") as f:
        return f.read()


def read_module(module: str, read: Reader) -> str | None:
    """Source of a package module under either tree layout (plain
    module or package ``__init__``)."""
    if not module.startswith(PACKAGE):
        return None
    base = module.replace(".", "/")
    return read(base + ".py") or read(base + "/__init__.py")


def _resolve_import(
    current_module: str, node: ast.AST
) -> list[tuple[str, str]]:
    """Package-internal module names a ``from X import a, b`` /
    ``import X`` statement reaches, paired with the symbols it binds.
    Returns list of (bound_name, target_module)."""
    out: list[tuple[str, str]] = []
    if isinstance(node, ast.Import):
        for alias in node.names:
            if alias.name.startswith(PACKAGE):
                out.append((alias.asname or alias.name.split(".")[0], alias.name))
    elif isinstance(node, ast.ImportFrom):
        if node.level:
            base_parts = current_module.split(".")[: -node.level]
            base = ".".join(base_parts)
        else:
            base = ""
        target = f"{base}.{node.module}" if node.module else base
        if not target.startswith(PACKAGE):
            return []
        for alias in node.names:
            # the symbol may itself be a submodule (from . import x)
            out.append((alias.asname or alias.name, target))
            out.append((alias.asname or alias.name, f"{target}.{alias.name}"))
    return out


_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _module_index(source: str):
    """Index a module's top level: def/class/assign source segments by
    bound name, plus its package-internal imports. Imports are collected
    from the WHOLE tree (``ast.walk``), not just ``tree.body`` --
    function-local ``from ..functions.dedup import q_decontaminate``
    style imports must reach the dependency closure too (round-5 advice:
    with top-level-only collection, editing ``dedup.py`` did not change
    ``corpus_curation_pipeline``'s fingerprint). The first-hop symbol
    filter still applies: the bound name appears in the query's source
    segment, so the dep only counts for queries that use it."""
    tree = ast.parse(source)
    segments: dict[str, str] = {}
    str_consts: list[str] = []
    imports: list[tuple[str, str]] = []
    pairings: dict[str, set[str]] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            seg = ast.get_source_segment(source, node) or ""
            segments[node.name] = seg
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            seg = ast.get_source_segment(source, node) or ""
            targets = (
                node.targets if isinstance(node, ast.Assign) else [node.target]
            )
            names = [t.id for t in targets if isinstance(t, ast.Name)]
            for n in names:
                segments[n] = seg
            val = node.value
            if isinstance(val, ast.Constant) and isinstance(val.value, str):
                str_consts.append(seg)
            elif isinstance(val, ast.JoinedStr):
                str_consts.append(seg)
            elif isinstance(val, ast.Dict):
                # registry dict literal ({"name": (q_fn, THE_SQL)}):
                # names appearing together in one entry's value are
                # PAIRED -- this is how a query function learns which
                # module constant is ITS oracle SQL, so the own
                # fingerprint covers exactly that constant instead of
                # every string in the module (whole-module constant
                # hashing made any new query flip every sibling's own
                # fingerprint -- round-6 lesson, second instance)
                for v in val.values:
                    vnames = {
                        x.id for x in ast.walk(v) if isinstance(x, ast.Name)
                    }
                    for fn_name in vnames:
                        pairings.setdefault(fn_name, set()).update(
                            vnames - {fn_name}
                        )
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            imports.extend(_resolve_import_safe(node))
    return segments, sorted(set(str_consts)), imports, pairings


class _Ctx:
    """Threads the current module name into import resolution."""

    current: str = ""


def _resolve_import_safe(node: ast.AST) -> list[tuple[str, str]]:
    try:
        return _resolve_import(_Ctx.current, node)  # type: ignore[arg-type]
    except Exception:
        return []


class Fingerprinter:
    """Memoizing fingerprint computer over one tree (one reader).
    Caches module sources, parsed indexes, and per-module transitive
    dep closures so fingerprinting the whole 100+-query registry costs
    one parse per module, not one per query."""

    def __init__(self, read: Reader):
        self._read = read
        self._src: dict[str, str | None] = {}
        self._idx: dict[str, tuple | None] = {}
        self._closure: dict[str, dict[str, str]] = {}

    def source(self, module: str) -> str | None:
        if module not in self._src:
            self._src[module] = read_module(module, self._read)
        return self._src[module]

    def index(self, module: str):
        if module not in self._idx:
            src = self.source(module)
            if src is None:
                self._idx[module] = None
            else:
                _Ctx.current = module
                try:
                    self._idx[module] = _module_index(src)
                except SyntaxError:
                    self._idx[module] = None
        return self._idx[module]

    def closure(self, module: str) -> dict[str, str]:
        """{module: source} for a module plus everything it
        transitively imports inside the package."""
        if module in self._closure:
            return self._closure[module]
        out: dict[str, str] = {}
        stack = [module]
        seen: set[str] = set()
        while stack:
            mod = stack.pop()
            if mod in seen:
                continue
            seen.add(mod)
            src = self.source(mod)
            if src is None:
                # not a module file (an imported symbol, or absent
                # from this tree) -- symbol-level changes are covered
                # by hashing the defining module
                continue
            out[mod] = src
            idx = self.index(mod)
            if idx is None:
                continue
            for _sym, dep in idx[2]:
                if dep.startswith(PACKAGE) and dep not in seen:
                    stack.append(dep)
        self._closure[module] = out
        return out

    def _own_text(self, module: str, func_name: str) -> "str | None":
        """Intra-module closure text for a query: its own source
        segment, reachable module-level helpers, and the module
        constants PAIRED with it through a registry dict entry (its
        oracle SQL). Other module constants stay out of the own text --
        they are covered conservatively by the FULL fingerprint."""
        idx = self.index(module)
        if idx is None:
            return None
        segments, _str_consts, _imports, pairings = idx
        if func_name not in segments:
            return None
        collected: dict[str, str] = {}
        frontier = [func_name] + sorted(pairings.get(func_name, ()))
        while frontier:
            name = frontier.pop()
            if name in collected or name not in segments:
                continue
            collected[name] = segments[name]
            for ref in set(_WORD.findall(segments[name])):
                if ref != name and ref in segments and ref not in collected:
                    frontier.append(ref)
        return "\n".join(collected[k] for k in sorted(collected))

    def query_own_fingerprint(self, module: str, func_name: str) -> str | None:
        """Hash of ONLY the intra-module closure. Distinguishes a query
        whose own code was edited from one marked stale merely because
        a shared dep module (e.g. ``sources/testdata``) changed -- the
        former must reach the verification window THIS round, the
        latter can wait its staleness turn (round-6 lesson: adding one
        loader function flooded the changed tier with every query in
        the registry and pushed the genuinely rewritten ones out)."""
        text = self._own_text(module, func_name)
        if text is None:
            return None
        return hashlib.sha256(text.encode("utf-8")).hexdigest()

    def query_fingerprint(self, module: str, func_name: str) -> str | None:
        """Per-query code fingerprint (own closure + ALL module string
        constants + transitively imported package modules). None when
        the defining module or the function is missing from the tree
        (== stale). The blanket constant inclusion is deliberately
        conservative at this level: an unpaired SQL edit still flips
        the full fingerprint (tier-2 re-verify), while only the
        query's OWN code/SQL flips the tier-1 own fingerprint."""
        idx = self.index(module)
        if idx is None:
            return None
        text = self._own_text(module, func_name)
        if text is None:
            return None
        _segments, str_consts, imports, _pairings = idx
        text += "\n".join(str_consts)

        # first-hop symbol filter: a dep module counts only if one of
        # the names it binds appears in the collected segments
        words = set(_WORD.findall(text))
        dep_sources: dict[str, str] = {}
        for dep in sorted({d for sym, d in imports if sym in words}):
            dep_sources.update(self.closure(dep))

        h = hashlib.sha256()
        h.update(text.encode("utf-8"))
        for mod in sorted(dep_sources):
            h.update(b"\x00")
            h.update(mod.encode())
            h.update(b"\x01")
            h.update(dep_sources[mod].encode("utf-8"))
        return h.hexdigest()


def query_fingerprint(module: str, func_name: str, read: Reader) -> str | None:
    """One-off convenience wrapper (tests, tools). Batch callers should
    share a :class:`Fingerprinter`."""
    return Fingerprinter(read).query_fingerprint(module, func_name)


def load_manifest() -> dict | None:
    try:
        with open(MANIFEST_PATH, "r", encoding="utf-8") as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def ordered_names(queries: dict) -> list[str] | None:
    """Registry names sorted for the 50-query correctness window:

    1. OWN code changed this round (the query's intra-module closure
       differs from ``head_own_fingerprint`` at the latest verified
       commit, or the query is new) -- algorithm rewrites in flight
       are the highest-risk evidence gap;
    2. everything else OLDEST GREEN FIRST, dep-changed before
       fresh/stale within the same evidence round, then by name.

    Round-7 re-rank: evidence age now outranks the dep-changed bit for
    own-unchanged queries. A module edit flips the full fingerprint of
    every sibling query at once, and under the old tiering one busy
    round could keep a whole registry-wide dep cohort (with perfectly
    recent evidence) ahead of untouched queries whose last green was
    rounds older -- the r4 tail would never drain while code kept
    moving. The dep change itself still gets exercised: its tier-1
    authors are in the window, and among equal-age queries the
    dep-changed ones still go first.

    Queries registered WITHOUT oracle SQL sort behind every
    oracle-checkable query regardless of staleness: the driver can only
    record ``err: no_oracle`` for them, so a window slot spent there
    verifies nothing (round-5 verdict: two slots were burned this way).
    Their accuracy is covered by hash-checked contract queries instead.

    None when no manifest exists (caller keeps static order)."""
    manifest = load_manifest()
    if not manifest:
        return None
    fper = Fingerprinter(worktree_reader)
    keys = []
    for name, (fn, sql) in queries.items():
        entry = manifest.get(name) or {}
        fp = fper.query_fingerprint(fn.__module__, fn.__qualname__)
        own_fp = fper.query_own_fingerprint(fn.__module__, fn.__qualname__)
        fresh = fp is not None and entry.get("fingerprint") == fp
        head_fp = entry.get("head_fingerprint")
        head_own = entry.get("head_own_fingerprint")
        green_own = entry.get("own_fingerprint")
        own_changed_now = (
            own_fp is None or head_own is None or head_own != own_fp
        )
        # r11: own code changed since the LAST GREEN row — even when
        # the edit landed in an earlier round — is the same evidence
        # gap as changed-this-round and fronts with it. (Six r8-green
        # queries carried r9 own-code edits invisibly because only
        # the vs-HEAD compare was tier-1.) Manifests written before
        # r11 lack the field; None keeps the old behavior.
        own_stale_since_green = (
            green_own is not None and green_own != own_fp
        )
        own_changed_now = own_changed_now or own_stale_since_green
        changed_now = fp is None or head_fp is None or head_fp != fp
        last_green = entry.get("last_green_round") or 0
        keys.append(
            (
                sql is None,
                not own_changed_now,
                last_green,
                not changed_now,
                fresh,
                name,
            )
        )
    keys.sort()
    return [name for *_rest, name in keys]
