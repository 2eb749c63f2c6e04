#!/usr/bin/env python
"""Bisect the axon per-step transient-gather fault threshold on real
hardware (VERDICT r4 item 4, mechanism half).

The seg8 dp schedule at 3D n=262,144 kernel-faults the TPU worker in
the FACTOR (round 5; rounds 3's two runs survived) and previously in
the SOLVE: both share one shape — a single lax.scan step whose unit
batch gathers (U, 128, 128) blocks out of a ~700MB pool, multiplies,
and scatter-adds.  At U=2,580 that transient is 169MB, straddling the
~150MB single-program fault envelope recorded in ROADMAP "Later" #1.

This probe isolates exactly that shape: per leg, a SUBPROCESS builds a
pool of the seg8 pools' size (679MB + 471MB), runs a 4-step scan whose
body gathers (U,128,128) twice, einsums, and scatter-adds, and reports
rc.  A worker crash kills only the subprocess; the parent records the
outcome and continues the ladder — the largest surviving U IS the
measured threshold, and TPUSPARSE_STEP_GATHER_MB's default (64MB ->
cap 1,024 units at 128x128) is derived from it with ~2x margin.

Usage: python bench/probe_step_gather.py [U U ...]
       (default ladder: 1024 2048 2580 3072 4096)
"""
import os
import subprocess
import sys
import time

CHILD = r"""
import os, sys, time
import numpy as np
U = int(sys.argv[1])
import jax, jax.numpy as jnp
from jax.lax import Precision
rows = 178000000 // 128        # ~679MB f32 pool (seg8's W=128 pool)
rng = np.random.default_rng(0)
pool = jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32))
pool2 = jnp.asarray(rng.normal(
    size=(123000000 // 128, 128)).astype(np.float32))   # ~471MB
steps = 4
src = jnp.asarray(rng.integers(0, rows - 1, size=(steps, U, 128)))
l0i = jnp.asarray(rng.integers(0, rows - 1, size=(steps, U, 128)))
tgt = jnp.asarray(rng.integers(0, rows - 1, size=(steps, U, 128)))

def body(pool, x):
    srci, l0i, tgti = x
    l1 = pool[srci]                          # (U,128,128) gather
    l0 = pool[l0i]
    delta = jnp.einsum("uhw,usw->uhs", l1, l0,
                       precision=Precision.HIGHEST)
    pool = pool.at[tgti.reshape(-1)].add(
        -delta.reshape(-1, 128) * 1e-6)
    return pool, None

@jax.jit
def run(pool, xs):
    pool, _ = jax.lax.scan(body, pool, xs)
    return pool

t0 = time.perf_counter()
out = run(pool, (src, l0i, tgt))
out.block_until_ready()
t1 = time.perf_counter() - t0
s = float(jnp.sum(out[:8]))
print(f"U={U}: OK compile+run {t1:.1f}s checksum {s:.3e}", flush=True)
"""


def log(m):
    print(m, flush=True)


def main():
    ladder = [int(a) for a in sys.argv[1:]] or [1024, 2048, 2580,
                                                3072, 4096]
    import jax
    log(f"step-gather fault bisect: backend={jax.default_backend()} "
        f"devices={jax.devices()}")
    del jax
    results = []
    for U in ladder:
        mb = U * 128 * 128 * 4 / (1 << 20)
        log(f"--- leg U={U} (per-gather {mb:.0f}MB, x2 gathers "
            f"+ {mb:.0f}MB delta) ---")
        t0 = time.perf_counter()
        p = subprocess.run([sys.executable, "-c", CHILD, str(U)],
                           capture_output=True, text=True, timeout=1800)
        t = time.perf_counter() - t0
        tail = (p.stdout + p.stderr).strip().splitlines()
        tail = tail[-1] if tail else ""
        verdict = "SURVIVED" if p.returncode == 0 else "FAULTED"
        log(f"U={U}: {verdict} rc={p.returncode} wall {t:.0f}s | {tail[:200]}")
        results.append((U, verdict))
        time.sleep(5)
    log("ladder: " + "  ".join(f"{u}:{v}" for u, v in results))
    ok = [u for u, v in results if v == "SURVIVED"]
    bad = [u for u, v in results if v == "FAULTED"]
    if ok and bad:
        log(f"threshold between {max([u for u in ok if u < min(bad)], default=max(ok))} "
            f"and {min(bad)} units "
            f"({min(bad) * 128 * 128 * 4 / (1 << 20):.0f}MB per gather)")


if __name__ == "__main__":
    main()
