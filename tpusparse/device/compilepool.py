"""Concurrent AOT compilation of per-segment programs (VERDICT r2
item 3 — compile-time at scale).

The superscan engines run one jitted program per segment (10-32 of
them).  Serially, each axon relay compile costs 90 s - 15 min, so the
first-run wall at scale is dominated by compilation that is embarrassingly
parallel: the programs are independent, XLA compilation releases the
GIL, and the relay round-trips overlap.  ``compile_many`` lowers every
not-yet-cached program to its AOT ``Compiled`` form on a thread pool and
stores the compiled executables in the caller's cache (same call
signature as the jitted function), so the subsequent serial execution
pass dispatches without compiling.

Shared-shape reuse falls out of the signature keying: two segments with
identical (phase-key, array-shape) signatures map to one cache entry and
compile once.

Env: TPUSPARSE_COMPILE_WORKERS (default 8; <=1 disables threading and
falls back to plain jax.jit caching).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Tuple

import jax

__all__ = ["compile_many"]


def _abstract(tree):
    def one(a):
        if not hasattr(a, "shape"):
            return a
        sh = getattr(a, "sharding", None)
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)

    return jax.tree.map(one, tree)


def compile_many(cache: Dict, jobs: List[Tuple]) -> None:
    """jobs: [(sig, fn, example_args_tuple)].  Ensures cache[sig] is a
    callable (jitted or AOT-compiled) for every job; compiles the
    missing ones concurrently."""
    todo = {}
    for sig, fn, args in jobs:
        if sig not in cache and sig not in todo:
            todo[sig] = (fn, args)
    if not todo:
        return
    workers = int(os.environ.get("TPUSPARSE_COMPILE_WORKERS", "8"))
    workers = min(workers, len(todo))
    try:
        backend = jax.default_backend()
    except Exception:                          # pragma: no cover
        backend = "cpu"
    if backend == "cpu":
        # CPU compiles are fast and the AOT path can persist-cache
        # executables with target features the next host rejects
        # (observed cpu_aot_loader machine-feature warnings); the
        # parallel win only matters on the axon relay
        workers = 1
    if workers <= 1:
        for sig, (fn, _args) in todo.items():
            cache[sig] = jax.jit(fn)
        return

    def compile_one(item):
        sig, (fn, args) = item
        absargs = tuple(_abstract(a) for a in args)
        try:
            return sig, jax.jit(fn).lower(*absargs).compile()
        except Exception:                      # pragma: no cover
            # AOT path failed (e.g. backend quirk): fall back to the
            # plain jitted callable, which compiles on first call
            return sig, jax.jit(fn)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        for sig, compiled in ex.map(compile_one, todo.items()):
            cache[sig] = compiled
