"""Per-query source fingerprints for the driver-evidence rotation.

VERDICT r7 #1: the audit window ranked only by green-round AGE, so a
query REWRITTEN in round N shipped with driver evidence from the old
code (tpch_q21's green row was two rewrites old). The fix needs a
notion of "has this query's code changed since its last green row" —
this module supplies it.

A query's fingerprint hashes the TRANSITIVE source closure of its
implementation, not just the decorated function: the query fn's
source, its oracle SQL, and the source of every function/class in
this package it (transitively) references — resolved statically from
code objects (global names, closure cells, nested lambdas, default
args) and, for classes, every method. That closure is what makes the
r7 gap detectable: ``y_program_merge``'s own fn never changed in r7,
but the ``compile_batch`` machinery it calls did, and the closure
hash moves with it.

Deliberately stdlib-only and registry-shape-agnostic: the updater
script (scripts/update_fingerprints.py) loads THIS file by path and
applies it to HISTORICAL worktrees of the repo (each round's freeze
commit) to recover what each query's fingerprint WAS when the driver
last greened it — so it must not import the package it is measuring,
and must tolerate the r1 registry (raw fns, no ``__wrapped__``).

Over-approximation is the designed failure mode: a changed helper
flags every query whose closure contains it, and the worst outcome is
a query being re-verified unnecessarily. Under-approximation (purely
dynamic dispatch through containers of callables) is possible but
rare in this codebase; the staleness ranking still backstops it.
"""

from __future__ import annotations

import hashlib
import importlib
import inspect

_PKG = "sql_to_dbsp_compiler_spark"


def _in_pkg(module_name: str | None) -> bool:
    return bool(module_name) and (
        module_name == _PKG or module_name.startswith(_PKG + ".")
    )


def _nested_codes(code):
    yield code
    for const in code.co_consts:
        if inspect.iscode(const):
            yield from _nested_codes(const)


# Per-object memo of (qualified-name, source) and discovered children.
# Shared helpers (load_table, the program compiler classes) sit in the
# closure of dozens of queries; memoizing getsource + child discovery
# by object id turns the all-registry sweep from ~6 s into well under
# a second of set unions.
_NODE_CACHE: dict[
    int, tuple[object, tuple[str, str] | None, tuple[object, ...]]
] = {}


def _expand(obj) -> tuple[tuple[str, str] | None, tuple[object, ...]]:
    """(qualname/source entry or None, children to visit) for obj."""
    if isinstance(obj, (staticmethod, classmethod)):
        return None, (obj.__func__,)
    if isinstance(obj, property):
        return None, tuple(f for f in (obj.fget, obj.fset, obj.fdel) if f)
    try:
        obj = inspect.unwrap(obj)
    except Exception:
        pass
    key = id(obj)
    hit = _NODE_CACHE.get(key)
    if hit is not None:
        return hit[1], hit[2]

    entry: tuple[str, str] | None = None
    children: list[object] = []
    if inspect.isfunction(obj) and _in_pkg(getattr(obj, "__module__", None)):
        try:
            entry = (
                f"{obj.__module__}.{obj.__qualname__}",
                inspect.getsource(obj),
            )
        except (OSError, TypeError):
            pass
        g = obj.__globals__
        names: set[str] = set()
        for code in _nested_codes(obj.__code__):
            names.update(code.co_names)
            names.update(code.co_freevars)
        children.extend(g[name] for name in names if name in g)
        for cell in obj.__closure__ or ():
            try:
                children.append(cell.cell_contents)
            except ValueError:  # empty cell (self-referential def)
                pass
        children.extend(obj.__defaults__ or ())
        children.extend((obj.__kwdefaults__ or {}).values())
        # attribute access on package modules (`mod.helper(...)`):
        # co_names holds both `mod` and `helper`; probe each
        # referenced package module for each referenced name
        for name in names:
            mod = g.get(name)
            if inspect.ismodule(mod) and _in_pkg(mod.__name__):
                for attr in names:
                    member = getattr(mod, attr, None)
                    if member is not None:
                        children.append(member)
        # FUNCTION-LOCAL imports (`from pkg.mod import helper` inside
        # the body — the prevailing style in the query modules) bind
        # nothing in __globals__, but IMPORT_NAME leaves the dotted
        # module path in co_names and IMPORT_FROM leaves the member
        # names; probe those modules too. Without this, a query whose
        # locally-imported callee changed would silently keep its old
        # fingerprint (caught in r8: dedup_minhash_pairs missed the
        # banded_md5 refactor of lsh_candidate_pairs_md5).
        for name in names:
            if "." in name and _in_pkg(name):
                try:
                    mod = importlib.import_module(name)
                except ImportError:
                    continue
                for attr in names:
                    member = getattr(mod, attr, None)
                    if member is not None:
                        children.append(member)
    elif inspect.isclass(obj) and _in_pkg(getattr(obj, "__module__", None)):
        try:
            entry = (
                f"{obj.__module__}.{obj.__qualname__}",
                inspect.getsource(obj),
            )
        except (OSError, TypeError):
            pass
        children.extend(vars(obj).values())

    # pin obj in the cache value: the key is id(obj), which could be
    # reused by a new object if obj were ever garbage-collected
    _NODE_CACHE[key] = (obj, entry, tuple(children))
    return entry, tuple(children)


def _closure_sources(fn) -> dict[str, str]:
    """qualified-name -> source text for fn and its package closure."""
    out: dict[str, str] = {}
    seen: set[int] = set()
    stack: list[object] = [fn]
    while stack:
        obj = stack.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))
        entry, children = _expand(obj)
        if entry is not None:
            out[entry[0]] = entry[1]
        stack.extend(c for c in children if id(c) not in seen)
    return out


def _hash_sources(sources: dict[str, str], oracle: str | None) -> str:
    h = hashlib.sha256()
    for key in sorted(sources):
        h.update(key.encode())
        h.update(b"\x00")
        h.update(sources[key].encode())
        h.update(b"\x01")
    h.update(b"\x02ORACLE\x02")
    h.update((oracle or "").encode())
    return h.hexdigest()


def fingerprint_registry(registry) -> dict[str, str]:
    """name -> fingerprint for every entry of a REGISTRY mapping.

    ``registry`` values need ``.fn`` and ``.oracle`` attributes — the
    shape every round's Query dataclass has had since r1.

    UBIQUITY EXCLUSION: a closure member reached by at least half of
    all queries (``load_table``, the session-conf pinner, …) carries
    no DIFFERENTIAL signal — when it changes, every fingerprint in the
    registry would move, which ranks nothing first and (being
    exercised by every driver window regardless) needs no targeted
    re-verification. Such members are dropped from the hash. The
    threshold is computed per-tree from that tree's own registry, so
    historical and current fingerprints exclude the same kind of
    member and stay comparable; a helper crossing the 50% line between
    rounds can cause a one-off spurious flag, which only costs one
    redundant re-verification."""
    closures = {name: _closure_sources(q.fn) for name, q in registry.items()}
    freq: dict[str, int] = {}
    for sources in closures.values():
        for key in sources:
            freq[key] = freq.get(key, 0) + 1
    cutoff = max(1, len(registry) // 2)
    ubiquitous = {key for key, n in freq.items() if n >= cutoff}
    return {
        name: _hash_sources(
            {k: v for k, v in closures[name].items() if k not in ubiquitous},
            registry[name].oracle,
        )
        for name in registry
    }
