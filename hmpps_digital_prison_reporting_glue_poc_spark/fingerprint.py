"""Per-query source fingerprints for refactor-dirtiness tracking.

Round 8 proved a shared-helper refactor can silently damage a query whose
driver CORRECTNESS row is green but stale (the kruskal_wallis term-assembly
break, caught by the bench run rather than the change process). This module
makes the exposure systematic instead of hand-maintained: every
``queries()`` entry gets a FINGERPRINT over

- the entry wrapper function's own source (plus every entry-module helper
  function it references, transitively — ``_t``/``_spread``/``_events``);
- its ``oracle_sql()`` twin (an oracle edit must force a re-check too);
- the file content of every PACKAGE module the wrapper touches,
  transitively through the package's import graph (an edit to
  ``operators/evaluation.py`` dirties every query that reaches it).

A committed baseline (``QUERY_FP.json``, written by
``scripts/gen_query_fp.py``) records each query's fingerprint as of its
most recent driver check. Queries whose CURRENT fingerprint differs are
"dirty" and claim the first slots of the driver rotation in
``__spark_entry__.queries()`` — generalizing the hand-maintained
``_R0x_CHANGED`` lists (r8 verdict task 2). The baseline is refreshed
per round by ``scripts/gen_query_fp.py --update CORRECTNESS_rNN.json``,
which re-baselines ONLY queries that round actually re-checked, so a
dirty query that misses one 50-slot window stays dirty until a driver
row lands for it.

Everything here is metadata-scale: AST parses + sha256 over ~40 package
files, well under a second at import time.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import re
import types
from collections.abc import Callable, Mapping

PACKAGE = "hmpps_digital_prison_reporting_glue_poc_spark"
_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_PKG_DIR)
BASELINE_PATH = os.path.join(_REPO_DIR, "QUERY_FP.json")

_DOTTED = re.compile(rf"{PACKAGE}(?:\.[A-Za-z_][A-Za-z_0-9]*)+")


def _sha(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8", "replace")).hexdigest()


def package_module_files() -> dict[str, str]:
    """{dotted module name: absolute file path} for every package module."""
    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(_PKG_DIR):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, _PKG_DIR)
            parts = rel[:-3].split(os.sep)
            if parts[-1] == "__init__":
                parts = parts[:-1]
            dotted = ".".join([PACKAGE, *parts]) if parts else PACKAGE
            out[dotted] = path
    return out


def _module_imports(path: str, modules: Mapping[str, str]) -> set[str]:
    """Package-internal modules imported by the file at ``path``.

    Handles ``import pkg.x.y``, ``from pkg.x import y`` (where y may be a
    submodule or a symbol — both resolve to a known module or to pkg.x),
    and function-local imports (ast.walk sees them all).
    """
    with open(path, encoding="utf-8") as fh:
        tree = ast.parse(fh.read())
    found: set[str] = set()

    def add(dotted: str) -> None:
        # longest known-module prefix (pkg.x.y.symbol -> pkg.x.y)
        parts = dotted.split(".")
        for i in range(len(parts), 0, -1):
            cand = ".".join(parts[:i])
            if cand in modules:
                found.add(cand)
                return

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PACKAGE):
                    add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            base = node.module or ""
            if node.level:  # relative import -> anchor at this file's pkg
                rel = os.path.relpath(path, _PKG_DIR)
                parts = rel[:-3].split(os.sep)
                if parts[-1] == "__init__":
                    parts = parts[:-1]
                anchor = [PACKAGE, *parts[: len(parts) - (node.level - 1) - 1]]
                base = ".".join([*anchor, base] if base else anchor)
            if base.startswith(PACKAGE):
                add(base)
                for alias in node.names:
                    add(f"{base}.{alias.name}")
    return found


def module_closure() -> dict[str, frozenset[str]]:
    """Transitive package-import closure per module (fixpoint over the
    AST import graph). {module: frozenset of modules incl. itself}."""
    modules = package_module_files()
    direct = {
        mod: _module_imports(path, modules) | {mod}
        for mod, path in modules.items()
    }
    closure = {mod: set(deps) for mod, deps in direct.items()}
    changed = True
    while changed:
        changed = False
        for mod, deps in closure.items():
            extra: set[str] = set()
            for d in deps:
                extra |= closure.get(d, set())
            if not extra <= deps:
                deps |= extra
                changed = True
    return {mod: frozenset(deps) for mod, deps in closure.items()}


def _entry_sources(fn: Callable, entry_mod: types.ModuleType) -> list[str]:
    """Source of ``fn`` plus every entry-module function it references,
    transitively (covers helpers like ``_t`` / ``_spread`` whose edits
    must dirty their consumers)."""
    seen: set[str] = set()
    sources: list[str] = []
    stack = [fn]
    while stack:
        f = stack.pop()
        name = getattr(f, "__name__", None)
        if name is None or name in seen:
            continue
        seen.add(name)
        try:
            sources.append(inspect.getsource(f))
        except (OSError, TypeError):  # builtins / C functions
            continue
        code = getattr(f, "__code__", None)
        if code is None:
            continue
        names: set[str] = set(code.co_names)
        for const in code.co_consts:  # nested defs / comprehensions
            if isinstance(const, types.CodeType):
                names |= set(const.co_names)
        for n in sorted(names):
            g = entry_mod.__dict__.get(n)
            if (
                isinstance(g, types.FunctionType)
                and g.__module__ == entry_mod.__name__
            ):
                stack.append(g)
    return sorted(sources)


def _referenced_modules(
    sources: list[str],
    fn: Callable,
    entry_mod: types.ModuleType,
    modules: Mapping[str, str],
) -> set[str]:
    """Package modules a wrapper touches: dotted paths in its source text
    (function-local ``from pkg... import`` lines) plus entry-module
    globals it names that are package modules/functions/classes."""
    found: set[str] = set()
    for src in sources:
        for m in _DOTTED.findall(src):
            parts = m.split(".")
            for i in range(len(parts), 0, -1):
                cand = ".".join(parts[:i])
                if cand in modules:
                    found.add(cand)
                    break
    code = getattr(fn, "__code__", None)
    names: set[str] = set(code.co_names) if code else set()
    if code:
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                names |= set(const.co_names)
    for n in sorted(names):
        g = entry_mod.__dict__.get(n)
        if isinstance(g, types.ModuleType) and g.__name__.startswith(PACKAGE):
            found.add(g.__name__)
        else:
            gmod = getattr(g, "__module__", None)
            if isinstance(gmod, str) and gmod.startswith(PACKAGE):
                found.add(gmod)
    return found


def query_fingerprints(
    queries: Mapping[str, Callable],
    oracle_sql: Mapping[str, str],
    entry_mod: types.ModuleType,
) -> dict[str, str]:
    """Fingerprint every query: sha256 over its wrapper+helpers source,
    its oracle SQL, and the content hash of every transitively imported
    package module file."""
    modules = package_module_files()
    closure = module_closure()
    file_hash: dict[str, str] = {}
    for mod, path in modules.items():
        with open(path, encoding="utf-8") as fh:
            file_hash[mod] = _sha(fh.read())

    out: dict[str, str] = {}
    for name, fn in queries.items():
        sources = _entry_sources(fn, entry_mod)
        mods: set[str] = set()
        for m in _referenced_modules(sources, fn, entry_mod, modules):
            mods |= closure.get(m, frozenset({m}))
        payload = json.dumps(
            {
                "src": sources,
                "sql": oracle_sql.get(name, ""),
                "mods": {m: file_hash.get(m, "") for m in sorted(mods)},
            },
            sort_keys=True,
        )
        out[name] = _sha(payload)
    return out


def query_module_map(
    queries: Mapping[str, Callable], entry_mod: types.ModuleType
) -> dict[str, frozenset[str]]:
    """{query: transitively imported package modules} — the import map
    behind the fingerprints, exposed for tests and audits."""
    modules = package_module_files()
    closure = module_closure()
    out: dict[str, frozenset[str]] = {}
    for name, fn in queries.items():
        sources = _entry_sources(fn, entry_mod)
        mods: set[str] = set()
        for m in _referenced_modules(sources, fn, entry_mod, modules):
            mods |= closure.get(m, frozenset({m}))
        out[name] = frozenset(mods)
    return out


def load_baseline(path: str = BASELINE_PATH) -> dict[str, str]:
    try:
        with open(path, encoding="utf-8") as fh:
            return dict(json.load(fh).get("fingerprints", {}))
    except (OSError, ValueError):
        return {}


def dirty_queries(
    queries: Mapping[str, Callable],
    oracle_sql: Mapping[str, str],
    entry_mod: types.ModuleType,
    baseline_path: str = BASELINE_PATH,
) -> set[str]:
    """Queries whose fingerprint differs from the committed baseline.
    Queries ABSENT from the baseline are NOT dirty (they are either
    brand-new — the never-checked rotation tier already front-loads
    them — or the baseline file is missing, in which case flagging all
    315 would destroy the rotation's oldest-first ordering)."""
    baseline = load_baseline(baseline_path)
    if not baseline:
        return set()
    current = query_fingerprints(queries, oracle_sql, entry_mod)
    return {
        name
        for name, fp in current.items()
        if name in baseline and baseline[name] != fp
    }
