"""AOT dispatch: jax.export artifacts for the prover's big graphs.

Fresh-process cost structure on the axon relay (measured round 4,
/tmp-probe then pinned in docs/PERF.md): for ONE batched-MSM graph,
Python tracing + MLIR lowering ≈ 198 s on the 1-core host and the
compile-cache load path ≈ 112 s — ×~5 such graphs ≈ the entire 1643 s
bench warmup. The same graph through a deserialized `jax.export`
artifact: **3.5 s** (no tracing; the StableHLO-keyed compile hits the
persistent cache and loads fast).

`call(key, fn, *args)`:
  * if `<repo>/.jax_export/<key>.jaxexp` exists, deserialize (cached in
    process) and `exp.call(*args)` — the warm path;
  * else run `fn(*args)` normally, and when ZKODST_AOT_EXPORT=1 also
    export+serialize the jitted fn for future processes (the populate
    pass; export re-traces, ~160 s per big graph, paid once per
    artifact refresh).

Artifacts are committed to git like the compile caches: machines are
wiped between driver runs (SURVEY.md §5.4 artifact-caching role). Keys
must encode every shape/static argument the graph depends on. On any
deserialize/call failure the plain path runs — AOT is an accelerator,
never a correctness dependency.
"""

from __future__ import annotations

import os
from typing import Callable

_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_export")

_CACHE: dict = {}
_MISSING: set = set()
_SALT: list = []


def _code_salt() -> str:
    """Hash of every package source file: ANY code change invalidates ALL
    artifacts (coarse but safe — a stale artifact would silently run the
    OLD graph; regeneration is one ZKODST_AOT_EXPORT=1 populate run)."""
    if not _SALT:
        import glob
        import hashlib

        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.blake2b(digest_size=8)
        for f in sorted(glob.glob(os.path.join(pkg, "**", "*.py"),
                                  recursive=True)):
            with open(f, "rb") as fh:
                h.update(fh.read())
        _SALT.append(h.hexdigest()[:10])
    return _SALT[0]


def _path(key: str) -> str:
    import jax

    return os.path.join(
        _DIR, f"{key}_{jax.default_backend()}_{_code_salt()}.jaxexp")


def export_wanted() -> bool:
    return bool(os.environ.get("ZKODST_AOT_EXPORT"))


def disabled() -> bool:
    return bool(os.environ.get("ZKODST_NO_AOT"))


def _tracing() -> bool:
    try:
        from jax._src import core as _core

        return not _core.trace_state_clean()
    except (ImportError, AttributeError):  # pragma: no cover
        return False


def call(key: str, fn: Callable, *args):
    """Dispatch `fn(*args)` through its exported artifact when present."""
    import jax

    if disabled() or _tracing():
        return fn(*args)
    exp = _CACHE.get(key)
    if exp is None and key not in _MISSING:
        p = _path(key)
        if os.path.exists(p):
            try:
                with open(p, "rb") as fh:
                    exp = jax.export.deserialize(fh.read())
                _CACHE[key] = exp
            except Exception as ex:        # version/format drift → plain
                # a silent fallback here degrades to the multi-minute
                # trace+compile path invisibly (ADVICE r4) — say so once
                print(f"# aot deserialize fallback for {key}: "
                      f"{type(ex).__name__}: {ex}", flush=True)
                _MISSING.add(key)
        else:
            _MISSING.add(key)
    if exp is not None:
        try:
            return exp.call(*args)
        except Exception as ex:             # shape/platform drift → plain
            print(f"# aot call fallback for {key}: "
                  f"{type(ex).__name__}: {ex}", flush=True)
            _MISSING.add(key)
            _CACHE.pop(key, None)
    out = fn(*args)
    if export_wanted():
        try:
            import glob

            os.makedirs(_DIR, exist_ok=True)
            e = jax.export.export(jax.jit(fn))(*args)
            backend = jax.default_backend()
            for stale in glob.glob(
                    os.path.join(_DIR, f"{key}_{backend}_*.jaxexp")):
                os.remove(stale)            # old code-salt versions
            with open(_path(key), "wb") as fh:
                fh.write(e.serialize())
            # compile + persistent-cache the EXPORT-path executable now:
            # its cache key differs from fn's jit path, and the whole
            # point is that the next process's exp.call() is a cache HIT
            jax.block_until_ready(e.call(*args))
            _MISSING.discard(key)
        except Exception as ex:  # pragma: no cover — export is best-effort
            print(f"# aot export failed for {key}: {type(ex).__name__}: "
                  f"{ex}", flush=True)
    return out
