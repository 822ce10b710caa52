"""Rotation-discipline tooling for the driver-sampled query registry.

The external driver certifies a 50-key PREFIX of the registry per round
(CORRECTNESS_r{N}.json). The rotation rules (documented since ADVICE r3):

  (a) every key whose implementation or oracle changed — or that is NEW —
      this round sits inside the sampled window;
  (b) the rest of the window refreshes the keys whose most recent driver
      row is oldest;
  (c) keys green in recent rounds with unchanged code rotate out.

VERDICT r7 item 8 asked for the bookkeeping to be GENERATED instead of a
hand-grown narrative comment. This module provides both halves:

1. ``python tools/rotation.py`` regenerates
   ``imperio_patitas_etl_spark/queries/certification.py`` — one table
   mapping every registry key to the last driver round that certified it
   (None = never driver-sampled) — from the CORRECTNESS_r*.json artifacts.

2. A static per-key IMPLEMENTATION FINGERPRINT (``key_fingerprints``) used
   by tests/test_rotation.py to enforce rule (a) against git: the
   fingerprint covers the transitive closure of package functions,
   classes, and module-level constants reachable from the key's query
   callable plus the key's oracle expression, with docstrings stripped —
   so a helper-function change (the r7 shingle-path miss) or an oracle
   edit flips the fingerprint, while comment/docstring churn does not.

The closure walk is intentionally symmetric: old and new trees are
analyzed by the same resolver, so any resolution blind spot (dynamic
dispatch, getattr) cancels out rather than producing false diffs.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
import subprocess
import sys
from collections.abc import Callable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "imperio_patitas_etl_spark"
#: modules whose QUERIES/ORACLE dicts seed the registry (mirrors
#: queries/__init__._MODULES; asserted in tests/test_rotation.py)
QUERY_MODULES = (
    f"{PKG}.queries.affinity",
    f"{PKG}.queries.streaming_ops",
    f"{PKG}.queries.text",
    f"{PKG}.queries.corpus",
    f"{PKG}.queries.analytics",
    f"{PKG}.queries.vector",
    f"{PKG}.queries.tpch",
    f"{PKG}.queries.entity",
    f"{PKG}.queries.multimodal_ops",
    f"{PKG}.queries.core",
)


# --------------------------------------------------------------------------
# static module index
# --------------------------------------------------------------------------


def _module_path(dotted: str) -> str:
    return dotted.replace(".", "/") + ".py"


def _strip_docstrings(node: ast.AST) -> ast.AST:
    """Remove docstring Expr nodes so doc-only edits don't flip hashes."""
    for n in ast.walk(node):
        if isinstance(
            n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module)
        ):
            body = getattr(n, "body", [])
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                n.body = body[1:] or [ast.Pass()]
    return node


def _dump(node: ast.AST) -> str:
    return ast.dump(_strip_docstrings(node), include_attributes=False)


class ModuleIndex:
    """Top-level symbols + import bindings of one module's AST."""

    def __init__(self, dotted: str, tree: ast.Module):
        self.dotted = dotted
        self.defs: dict[str, list[ast.AST]] = {}
        self.imports: dict[str, tuple] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.defs.setdefault(node.name, []).append(node)
            elif isinstance(node, (ast.Assign, ast.AnnAssign, ast.AugAssign)):
                for name in _assign_names(node):
                    self.defs.setdefault(name, []).append(node)
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                _bind_imports(node, self.imports)
        self.tree = tree


def _assign_names(node: ast.AST) -> list[str]:
    targets = []
    if isinstance(node, ast.Assign):
        targets = node.targets
    elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
        targets = [node.target]
    out = []
    for t in targets:
        if isinstance(t, ast.Name):
            out.append(t.id)
        elif isinstance(t, (ast.Tuple, ast.List)):
            out.extend(e.id for e in t.elts if isinstance(e, ast.Name))
    return out


def _bind_imports(node: ast.AST, binds: dict[str, tuple]) -> None:
    """Record name → ("module", dotted) or ("symbol", module, attr)."""
    if isinstance(node, ast.Import):
        for a in node.names:
            if a.name.startswith(PKG):
                binds[a.asname or a.name.split(".")[0]] = ("module", a.name)
    elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
        for a in node.names:
            local = a.asname or a.name
            # `from pkg.sub import mod` may bind a module, not a symbol;
            # the resolver tries symbol-in-module first, then submodule.
            binds[local] = ("symbol", node.module, a.name)


class PackageIndex:
    """All package modules, parsed through one source accessor."""

    def __init__(self, get_source: Callable[[str], str | None]):
        self.get_source = get_source
        self.modules: dict[str, ModuleIndex | None] = {}

    def module(self, dotted: str) -> ModuleIndex | None:
        if dotted not in self.modules:
            src = self.get_source(_module_path(dotted))
            self.modules[dotted] = (
                ModuleIndex(dotted, ast.parse(src)) if src is not None else None
            )
        return self.modules[dotted]


def _referenced_names(node: ast.AST) -> tuple[set[str], dict[str, tuple], list[tuple]]:
    """Names read inside ``node``, function-local import bindings, and
    module-attribute references (alias, attr)."""
    names: set[str] = set()
    local_binds: dict[str, tuple] = {}
    attr_refs: list[tuple] = []
    for n in ast.walk(node):
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
            names.add(n.id)
        elif isinstance(n, (ast.Import, ast.ImportFrom)):
            _bind_imports(n, local_binds)
        elif isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            attr_refs.append((n.value.id, n.attr))
    return names, local_binds, attr_refs


def closure(
    index: PackageIndex, module: str, name: str, visited: set | None = None
) -> dict[tuple[str, str], str]:
    """Transitive {(module, symbol): normalized-dump} reachable from a
    top-level symbol, following package-internal references only."""
    if visited is None:
        visited = set()
    key = (module, name)
    if key in visited:
        return {}
    visited.add(key)
    mi = index.module(module)
    if mi is None:
        return {key: "<missing-module>"}
    nodes = mi.defs.get(name)
    if nodes is None:
        # name may itself be a submodule (from pkg import mod) — no source
        # contribution of its own; references through it are handled via
        # attr_refs at the call sites.
        return {}
    out = {key: "\n".join(_dump(n) for n in nodes)}
    for node in nodes:
        names, local_binds, attr_refs = _referenced_names(node)
        binds = {**mi.imports, **local_binds}

        def _resolve(nm: str) -> tuple[str, str] | None:
            if nm in binds:
                kind, *rest = binds[nm]
                if kind == "symbol":
                    mod, sym = rest
                    target = index.module(mod)
                    if target is not None and sym in target.defs:
                        return (mod, sym)
                    # not a symbol — submodule import; no direct node
                    return None
                return None  # bare module import
            if nm in mi.defs and nm != name:
                return (module, nm)
            if nm in mi.defs and nm == name:
                return None  # recursion on self already covered
            return None

        for nm in sorted(names):
            tgt = _resolve(nm)
            if tgt:
                out.update(closure(index, *tgt, visited))
        for alias, attr in attr_refs:
            bound = binds.get(alias)
            mod = None
            if bound and bound[0] == "module":
                mod = bound[1]
            elif bound and bound[0] == "symbol":
                cand = f"{bound[1]}.{bound[2]}"
                if index.module(cand) is not None:
                    mod = cand
            if mod:
                target = index.module(mod)
                if target is not None and attr in target.defs:
                    out.update(closure(index, mod, attr, visited))
                else:
                    # package-internal reference the resolver cannot pin
                    # to a symbol (deeper attribute chain into a
                    # submodule, getattr table, re-export): hash the
                    # WHOLE module it points through, so a change there
                    # cannot escape rule (a). Symmetry only prevents
                    # false diffs, not missed ones (ADVICE r8) — the
                    # fallback over-includes rather than under-includes.
                    submod = index.module(f"{mod}.{attr}")
                    fb_mod, fb = (f"{mod}.{attr}", submod) if submod else (mod, target)
                    if fb is not None:
                        mkey = (fb_mod, "<module>")
                        if mkey not in visited:
                            visited.add(mkey)
                            out[mkey] = _dump(fb.tree)
    return out


# --------------------------------------------------------------------------
# per-key fingerprints
# --------------------------------------------------------------------------


def _dict_literal(mi: ModuleIndex, dict_name: str) -> dict[str, ast.expr]:
    """String-keyed entries of a top-level ``NAME = { ... }`` literal."""
    out: dict[str, ast.expr] = {}
    for node in mi.defs.get(dict_name, []):
        value = getattr(node, "value", None)
        if isinstance(value, ast.Dict):
            for k, v in zip(value.keys, value.values):
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    out[k.value] = v
    return out


def key_fingerprints(index: PackageIndex) -> dict[str, str]:
    """key → sha256 over the implementation closure + oracle expression."""
    fps: dict[str, str] = {}
    for dotted in QUERY_MODULES:
        mi = index.module(dotted)
        if mi is None:
            continue
        queries = _dict_literal(mi, "QUERIES")
        oracles = _dict_literal(mi, "ORACLE")
        for key, expr in queries.items():
            parts: list[tuple[str, str]] = []
            seeds: list[tuple[str, str]] = []
            for e in (expr, oracles.get(key)):
                if e is None:
                    continue
                parts.append((f"<seed:{dotted}>", _dump(e)))
                names, local_binds, attr_refs = _referenced_names(e)
                for nm in sorted(names):
                    if nm in mi.defs:
                        seeds.append((dotted, nm))
                    elif nm in mi.imports and mi.imports[nm][0] == "symbol":
                        seeds.append((mi.imports[nm][1], mi.imports[nm][2]))
            visited: set = set()
            cl: dict[tuple[str, str], str] = {}
            for mod, nm in seeds:
                cl.update(closure(index, mod, nm, visited))
            parts.extend((f"{m}:{n}", d) for (m, n), d in cl.items())
            blob = "\x00".join(f"{label}\x01{dump}" for label, dump in sorted(parts))
            fps[key] = hashlib.sha256(blob.encode()).hexdigest()
    return fps


# --------------------------------------------------------------------------
# source accessors
# --------------------------------------------------------------------------


def worktree_source(relpath: str) -> str | None:
    p = os.path.join(REPO, relpath)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read()


def git_source(commit: str) -> Callable[[str], str | None]:
    def get(relpath: str) -> str | None:
        r = subprocess.run(
            ["git", "show", f"{commit}:{relpath}"],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        return r.stdout if r.returncode == 0 else None

    return get


def round_boundary_commit() -> str | None:
    """Most recent driver round-boundary commit ('round N: ...')."""
    r = subprocess.run(
        ["git", "log", "--format=%H\t%s", "-n", "2000"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    for line in r.stdout.splitlines():
        sha, _, subject = line.partition("\t")
        if re.match(r"^round \d+: ", subject):
            return sha
    return None


def changed_keys_since(commit: str) -> set[str]:
    """Registry keys that are NEW or whose implementation/oracle
    fingerprint differs from ``commit`` — the rule-(a) set."""
    now = key_fingerprints(PackageIndex(worktree_source))
    then = key_fingerprints(PackageIndex(git_source(commit)))
    return {k for k, fp in now.items() if then.get(k) != fp}


# --------------------------------------------------------------------------
# certification table generation
# --------------------------------------------------------------------------


def driver_history() -> dict[str, list[tuple[int, bool]]]:
    hist: dict[str, list[tuple[int, bool]]] = {}
    for fname in sorted(os.listdir(REPO)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(REPO, fname)) as f:
            data = json.load(f)
        for key, row in data.items():
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            hist.setdefault(key, []).append((rnd, ok))
    return hist


def latest_sampled(
    max_round: int | None = None,
) -> dict[str, tuple[int, bool] | None]:
    """key → (round, ok) of the key's MOST RECENT driver row, regardless
    of color. ``last_certified`` alone hides a driver-observed regression
    on unchanged code (green r5, red r7 still reads 'certified r5');
    window planning must see the red (ADVICE r8)."""
    sys.path.insert(0, REPO)
    from imperio_patitas_etl_spark.queries import all_queries

    hist = driver_history()
    out: dict[str, tuple[int, bool] | None] = {}
    for key in all_queries():
        rows = [
            (r, ok)
            for r, ok in hist.get(key, [])
            if max_round is None or r <= max_round
        ]
        out[key] = max(rows, key=lambda t: t[0]) if rows else None
    return out


def last_certified(max_round: int | None = None) -> dict[str, int | None]:
    """key → last green driver round. ``max_round`` restricts the scan to
    artifacts from rounds ≤ that round — used by the sync test so a
    freshly driver-written CORRECTNESS file does not read as a broken
    build before the round ritual (``python tools/rotation.py``)
    regenerates the table."""
    sys.path.insert(0, REPO)
    from imperio_patitas_etl_spark.queries import all_queries

    hist = driver_history()
    out: dict[str, int | None] = {}
    for key in all_queries():
        greens = [
            r
            for r, ok in hist.get(key, [])
            if ok and (max_round is None or r <= max_round)
        ]
        out[key] = max(greens) if greens else None
    return out


def write_certification(path: str | None = None) -> str:
    path = path or os.path.join(REPO, PKG, "queries", "certification.py")
    table = last_certified()
    lines = [
        '"""GENERATED by tools/rotation.py — do not edit by hand.',
        "",
        "Last driver round whose CORRECTNESS_r{N}.json certified each registry",
        "key green (None = never driver-sampled). Regenerate after every round:",
        "",
        "    python tools/rotation.py",
        '"""',
        "",
        "LAST_DRIVER_ROUND: dict[str, int | None] = {",
    ]
    # canonical (sorted-key) order: the registry iteration order depends
    # on the CURRENT _R*_FRONT window, so emitting in that order made a
    # re-run after the window rotation rewrite the file as a pure-reorder
    # 96-line diff (every consumer compares the dict, never the order)
    for key in sorted(table):
        lines.append(f"    {key!r}: {table[key]!r},")
    lines.append("}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def plan_next_window(size: int = 50) -> list[str]:
    """Suggest the next round's sampled window under the rotation rules:
    rule (a) keys first (changed since the round boundary — includes new
    keys), then never-certified keys, then stalest rows (rule (b)).
    Purely advisory — the authoritative window is the _R*_FRONT tuple in
    queries/__init__.py; this exists so constructing it is mechanical."""
    boundary = round_boundary_commit()
    changed = sorted(changed_keys_since(boundary)) if boundary else []
    table = last_certified()
    latest = latest_sampled()
    # a key whose MOST RECENT driver row is red is as urgent as a changed
    # key — the regression escaped rule (a) (unchanged code) and must be
    # re-sampled, not aged out by its older green row (ADVICE r8)
    red = sorted(
        k
        for k, row in latest.items()
        if row is not None and not row[1] and k not in changed
    )
    front = [*changed, *red]
    never = [k for k, r in table.items() if r is None and k not in front]
    stale = sorted(
        (k for k, r in table.items() if r is not None and k not in front),
        key=lambda k: (table[k], k),
    )
    window = [*front, *never, *stale][:size]
    overflow = len(front) + len(never) - size
    if red:
        print(
            f"NOTE: {len(red)} key(s) whose latest driver row is RED are "
            f"front-loaded: {', '.join(red)}",
            file=sys.stderr,
        )
    if overflow > 0:
        print(
            f"WARNING: {len(changed)} changed + {len(red)} red + "
            f"{len(never)} never-certified keys exceed the {size}-key "
            f"window by {overflow}; the overflow spills to the following "
            "round — prefer freezing code churn until the debt clears.",
            file=sys.stderr,
        )
    return window


def main() -> None:
    # argparse (same family as check.py/sweep_batch.py since r13/r14):
    # before this, an unknown flag — including --help — fell through to
    # the default branch and silently ran a full certification rewrite.
    import argparse

    ap = argparse.ArgumentParser(
        allow_abbrev=False,
        prog="rotation.py",
        description=(
            "Regenerate queries/certification.py from the CORRECTNESS_r* "
            "artifacts (default), or print the planned next 50-key window."
        ),
    )
    ap.add_argument(
        "--plan-next",
        action="store_true",
        help="print the rule-(a)+(b) window plan for the next round and exit",
    )
    args = ap.parse_args()
    if args.plan_next:
        for k in plan_next_window():
            print(k)
        return
    path = write_certification()
    table = last_certified()
    never = [k for k, r in table.items() if r is None]
    oldest = sorted((r, k) for k, r in table.items() if r is not None)[:10]
    print(f"wrote {path}: {len(table)} keys, {len(never)} never driver-sampled")
    if never:
        print("never sampled:", ", ".join(never))
    print("oldest rows:", ", ".join(f"{k}=r{r}" for r, k in oldest))
    boundary = round_boundary_commit()
    if boundary:
        changed = changed_keys_since(boundary)
        print(f"changed since round boundary {boundary[:9]}: {len(changed)}")
        if changed:
            print(" ", ", ".join(sorted(changed)))


if __name__ == "__main__":
    main()
