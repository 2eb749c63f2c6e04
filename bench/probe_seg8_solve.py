"""seg8 device-resident solve fault: hardware bisect of the per-step
slot-extent threshold (VERDICT r4 item 4).

Reproduces artifacts/bench_tpu_superscan_3d_262144_seg8*: 3D Laplacian
n=262,144 planned at 8 dp segments (the coarse segmentation that packs
~4x the units per solve step), factored once, then the device-resident
solve executed at an ascending ladder of TPUSPARSE_SOLVE_SLOT_CAP
values.  Each leg's outcome is flushed to stdout BEFORE the next leg
runs, so when a leg kernel-faults the axon worker (the original
failure mode) the log still records every cap that survived — the
largest surviving cap IS the measured threshold, and the shipped
default is derived from it.

Usage:  python bench/probe_seg8_solve.py [cap cap ...]
        (default ladder: 1024 2048 4096 8192 16384 0;  0 = uncapped,
        the configuration that crashed the TPU worker in round 3/4)

Reference: cs_lsolve.c / cs_ltsolve.c semantics at scale — the solve
must be available device-resident for every segmentation the factor
supports, not only fine (seg>=30) schedules.
"""
import os
import sys
import time

os.environ.setdefault("TPUSPARSE_SEG_MODE", "dp")
os.environ.setdefault("TPUSPARSE_SWITCH", "0")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    caps = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192,
                                              16384, 0]
    import jax
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from bench import grid_spd_3d
    from tpusparse.device.superscan import SuperscanCholesky, _solve_xs
    from tpusparse.demo import resid_metric

    g = int(os.environ.get("TPUSPARSE_BENCH_LADDER_G", "64"))
    A, _ = grid_spd_3d(g)
    n = A.n
    log(f"probe: 3D grid {g}^3 SPD n={n} nnz={A.nnz} "
        f"backend={jax.default_backend()} seg_mode=dp max_segments=8")

    # order=1 (AMD) matches the original reproducer: bench.py's
    # superscan leg runs TPUSPARSE_BENCH_SN_ORDER=1 (lnz 184M; natural
    # order fills to ~1e9 at this size and never reaches the solve)
    t0 = time.perf_counter()
    F = SuperscanCholesky(A, order=1, max_segments=8)
    log(f"plan {time.perf_counter() - t0:.1f}s: "
        f"segments={len(F.plan.segments)} "
        f"waste={F.plan.waste_ratio:.3f} lnz={F.plan.lnz}")

    # CPU-side: the uncapped per-step slot extents, so the bisect
    # threshold is interpretable in units of the schedule itself.
    os.environ["TPUSPARSE_SOLVE_SLOT_CAP"] = "0"
    sched0 = _solve_xs(F.plan)
    ext = [a.shape[1] for s in sched0 for d in s.values()
           for a in d.values()]
    log(f"uncapped solve schedule: {len(sched0)} programs, per-step "
        f"slot extents max={max(ext)} p95={int(np.percentile(ext, 95))} "
        f"median={int(np.median(ext))}")
    del sched0

    t0 = time.perf_counter()
    ok = F.factor()
    log(f"factor ok={ok} first-call {time.perf_counter() - t0:.1f}s")
    assert ok

    rng = np.random.default_rng(0)
    b = rng.normal(size=n)
    for cap in caps:
        os.environ["TPUSPARSE_SOLVE_SLOT_CAP"] = str(cap)
        F._solve_sched = None
        F._sched_dev_cache = None
        log(f"--- SOLVE ATTEMPT cap={cap or 'uncapped'} ---")
        t0 = time.perf_counter()
        x = F.solve(b, refine_iters=2)
        t = time.perf_counter() - t0
        r = resid_metric(A, x, b)
        sched = F._sched()
        mx = max(a.shape[1] for s in sched for d in s.values()
                 for a in d.values())
        log(f"cap={cap or 'uncapped'}: SURVIVED  solve+refine {t:.1f}s "
            f"resid {r:.3e}  programs={len(sched)} max_step_slots={mx}")
    log("ladder complete — no fault at any cap")


if __name__ == "__main__":
    main()
