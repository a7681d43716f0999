"""Drop-in filter plugins loaded from files — the analogue of the
reference's Lua filter host.

The reference accepts user filters two ways (SURVEY.md §2.10):
  * a directory scan at service init — every ``$NXS_BASEDIR/filters/
    *.lua`` is registered under its file stem
    (reference svc-src/nxsearch_svc.lua:24-34),
  * each module returns a lifecycle table ``{create, destroy, filter,
    cleanup}`` where ``filter(ctx, value) -> (result|nil, err)`` and
    ``nil, nil`` means discard
    (reference src/core/filters_lua.c:224-289,
    docs/lua-filters-api.md:19-80).

Here the same contract binds Python plugin files: a ``.py`` file that
defines module-level ``filter(ctx, value)`` (plus optional ``create``/
``destroy``/``cleanup``) is loaded with importlib and registered under
its stem.  Returning ``None`` discards the token; returning a string
mutates it; raising aborts the document (the Lua ERROR action).

Actual ``.lua`` files are accepted when the ``lupa`` binding is
available (it is not in this sandbox, so that path is import-gated and
raises a clear error rather than silently degrading).  The Lua table
contract is translated 1:1: ``create(params)`` gets the params dict as
a Lua table, ``filter(ctx, value)`` returns the mutated string or nil.
"""

from __future__ import annotations

import importlib.util
import os
from typing import Any

from nxsearch_ray.functions.filters import FilterAction, register_filter


def _adapt_table(table: Any):
    """Wrap a {create, filter, ...} lifecycle table as a registry
    factory with reference semantics (filters_lua.c:253-289: nil result
    ⇒ DISCARD, string ⇒ MUTATION)."""
    filt_fn = table["filter"] if isinstance(table, dict) \
        else getattr(table, "filter")
    create_fn = (table.get("create") if isinstance(table, dict)
                 else getattr(table, "create", None))

    def factory(params: dict):
        ctx = create_fn(dict(params)) if create_fn is not None else None

        def run(token: str):
            out = filt_fn(ctx, token)
            if out is None:
                return FilterAction.DISCARD, token
            return FilterAction.MUTATION, str(out)

        return run

    return factory


def load_python_filter(path: str, name: str | None = None) -> str:
    """Load one ``.py`` plugin file and register it as a token filter.

    The module must define ``filter(ctx, value) -> str | None`` at top
    level; ``create(params) -> ctx`` is optional (ctx is None without
    it).  Returns the registered name (file stem by default)."""
    name = name or os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(
        f"nxsearch_ray_plugin_{name}", path)
    if spec is None or spec.loader is None:
        raise ImportError(f"cannot load plugin file {path!r}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not callable(getattr(mod, "filter", None)):
        raise AttributeError(
            f"plugin {path!r} defines no callable `filter(ctx, value)`")
    table = {"filter": mod.filter,
             "create": getattr(mod, "create", None)}
    register_filter(name, _adapt_table(table))
    return name


def load_lua_filter(path: str, name: str | None = None) -> str:
    """Load an actual ``.lua`` filter file (drop-in reference parity).

    Requires the ``lupa`` Lua binding; raises RuntimeError when it is
    unavailable (this sandbox ships no Lua runtime — declared
    limitation, the Python plugin path above carries the same
    contract)."""
    try:
        import lupa
    except ImportError as e:  # pragma: no cover - lupa absent here
        raise RuntimeError(
            "loading .lua filters requires the `lupa` package, which is "
            "not installed; use a .py plugin with the same "
            "{create, filter} contract instead") from e

    name = name or os.path.splitext(os.path.basename(path))[0]
    rt = lupa.LuaRuntime(unpack_returned_tuples=True)
    with open(path) as f:
        table = rt.execute(f.read())
    if table is None or table["filter"] is None:
        raise ValueError(f"lua filter {path!r} returned no "
                         "{create, filter} table")

    def factory(params: dict):
        ctx = None
        if table["create"] is not None:
            ctx = table["create"](rt.table(**params))

        def run(token: str):
            out = table["filter"](ctx, token)
            if out is None:
                return FilterAction.DISCARD, token
            return FilterAction.MUTATION, str(out)

        return run

    register_filter(name, factory)
    return name


def ensure_plugins(paths) -> None:
    """Idempotently load plugin files into this process's registry.

    Called from actor ``__init__`` (the per-worker analogue of the
    reference's per-nginx-worker filter init): every Ray worker process
    has its own registry, so config-listed plugin files must load
    wherever a pipeline is built — a no-op for names already present."""
    from nxsearch_ray.functions.filters import filter_registered

    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        if filter_registered(name):
            continue
        if path.endswith(".lua"):
            load_lua_filter(path)
        else:
            load_python_filter(path)


def load_filters_from_dir(dirpath: str) -> list[str]:
    """Register every plugin file in a directory — the service-init
    scan (reference svc-src/nxsearch_svc.lua:24-34).  ``.py`` files
    always load; ``.lua`` files load when lupa is present."""
    names = []
    for fname in sorted(os.listdir(dirpath)):
        path = os.path.join(dirpath, fname)
        if fname.endswith(".py"):
            names.append(load_python_filter(path))
        elif fname.endswith(".lua"):
            names.append(load_lua_filter(path))
    return names
