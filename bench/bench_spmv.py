#!/usr/bin/env python
"""General-pattern SpMV benchmark (VERDICT r1 item 6): an IRREGULAR
(non-banded) matrix at n>=100k through the SELL windowed-gather Pallas
kernel vs the XLA ELL-gather path, with the banded DIA path as the
relay-floor reference.  Same serialized y-carry harness as bench.py.
Prints ONE JSON line.

Env: TPUSPARSE_BENCH_SPMV_N (default 131072), TPUSPARSE_BENCH_CPU=1,
TPUSPARSE_BENCH_SPMV_GRAPH=ba for the power-law (Barabasi-Albert)
variant exercising the segmented-sum path (VERDICT r2 item 6).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def irregular_graph(n, k=6, seed=0):
    """k-NN graph on random points: irregular pattern with geometric
    locality (RCM-compressible) — the unstructured-mesh SpMV shape."""
    import scipy.sparse as sp
    from scipy.spatial import cKDTree
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 2))
    T = cKDTree(pts)
    _, idx = T.query(pts, k=k + 1)
    rows = np.repeat(np.arange(n), k)
    cols = idx[:, 1:].reshape(-1)
    M = sp.coo_matrix((rng.normal(size=rows.size), (rows, cols)),
                      shape=(n, n)).tocsc()
    M = (M + M.T + sp.eye(n) * 10).tocsc()
    M.sort_indices()
    from tpusparse.core import CSCMatrix
    return CSCMatrix(n, n, M.indptr, M.indices, M.data)


def ba_graph(n, m0=4, seed=0):
    """Barabasi-Albert preferential attachment: power-law degree tail
    (hub degree ~ O(sqrt(n*m0))) — the shape whose max-substep slabs /
    COO spill defeat the SELL packing (VERDICT r2 item 6)."""
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    # vectorized preferential attachment: sample targets from the
    # endpoint multiset built so far, in batches
    repeated = np.zeros(2 * m0 * n, np.int64)
    rlen = 0
    for v in range(m0):
        repeated[rlen] = v
        rlen += 1
    rows = np.empty(m0 * (n - m0), np.int64)
    cols = np.empty(m0 * (n - m0), np.int64)
    e = 0
    for v in range(m0, n):
        tg = (np.arange(m0) if v == m0 else
              repeated[rng.integers(0, rlen, size=m0)])
        rows[e:e + m0] = v
        cols[e:e + m0] = tg
        repeated[rlen:rlen + m0] = tg
        repeated[rlen + m0:rlen + 2 * m0] = v
        rlen += 2 * m0
        e += m0
    M = sp.coo_matrix((rng.normal(size=e), (rows[:e], cols[:e])),
                      shape=(n, n)).tocsc()
    M = (M + M.T + sp.eye(n) * 10).tocsc()
    M.sort_indices()
    from tpusparse.core import CSCMatrix
    return CSCMatrix(n, n, M.indptr, M.indices, M.data)


def measure(plan, n, jax, jnp, reps=50, permuted=False):
    """Serialized-loop timing of plan.apply, or (permuted=True) of the
    SELL permuted-space kernel — the steady-state iterative-consumer op
    without the two n-sized permutation gathers."""
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=n),
                     jnp.float32)
    np.asarray(plan.apply(x0))
    if permuted:
        sr, sc, sv, _pv, _pi, *flat = plan._bufs
        kern = plan._kernel

        @jax.jit
        def loop(x):
            def body(i, x):
                y = kern(sr, sc, sv, *flat, x)[:n]
                return 0.125 * y
            return jax.lax.fori_loop(0, reps, body, x)
    else:
        bufs = plan._bufs
        apply_fn = plan._apply

        @jax.jit
        def loop(x):
            def body(i, x):
                y = apply_fn(*bufs, x)[:n]
                return 0.125 * y
            return jax.lax.fori_loop(0, reps, body, x)

    loop(x0).block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        loop(x0).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def main():
    if os.environ.get("TPUSPARSE_BENCH_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    from tpusparse.device.spmv import spmv_plan
    from bench import grid_spd

    n = int(os.environ.get("TPUSPARSE_BENCH_SPMV_N", "131072"))
    graph = os.environ.get("TPUSPARSE_BENCH_SPMV_GRAPH", "knn")
    if graph == "ba":
        A = ba_graph(n)
        deg = np.bincount(A.indices, minlength=A.m)
        log(f"spmv bench: Barabasi-Albert n={A.n} nnz={A.nnz} "
            f"maxdeg={deg.max()} meddeg={np.median(deg):.0f}, "
            f"backend={jax.default_backend()}")
        modes = ("seg", "sell", "ell")
    else:
        A = irregular_graph(n)
        log(f"spmv bench: irregular kNN graph n={A.n} nnz={A.nnz}, "
            f"backend={jax.default_backend()}")
        modes = ("sell", "ell")

    out = {}
    for mode in modes:
        if mode == "ell":
            # ELL's slab is m x max_degree: on power-law graphs that is
            # gigabytes (the pathology the seg path exists for) and the
            # relay rejects the program (HTTP 413).  Cap it.
            deg = np.bincount(A.indices, minlength=A.m)
            ell_bytes = int(A.m) * int(deg.max()) * 8
            if ell_bytes > 200 << 20:
                log(f"ell: slab would be {ell_bytes >> 20}MB "
                    f"(max degree {deg.max()}) — infeasible, skipped")
                out["ell_gbs"] = 0.0
                out["ell_infeasible_mb"] = ell_bytes >> 20
                continue
        t0 = time.perf_counter()
        plan = spmv_plan(A, mode=mode)
        t_plan = time.perf_counter() - t0
        t = measure(plan, A.n, jax, jnp)
        gbs = plan.bytes_min / t / 1e9
        extra = ""
        if mode == "seg":
            extra = (f" waste={plan.waste_ratio:.3f} spill={plan.spill}"
                     f" (auto={spmv_plan(A, mode='auto').mode})")
            out["seg_waste"] = round(plan.waste_ratio, 4)
            out["seg_spill_frac"] = float(plan.spill) / A.nnz
        if mode == "sell":
            extra = (f" waste={plan.waste_ratio:.3f} "
                     f"spill={plan.spill}/{A.nnz}")
            out["sell_spill_frac"] = round(float(plan.spill) / A.nnz, 4)
            out["sell_waste"] = round(plan.waste_ratio, 4)
            tp = measure(plan, A.n, jax, jnp, permuted=True)
            gbp = plan.bytes_min / tp / 1e9
            log(f"sell permuted-space (CG steady state): "
                f"{tp*1e6:.1f} us -> {gbp:.2f} GB/s (min-bytes)")
            out["sell_permuted_gbs"] = round(gbp, 2)
            out["sell_permuted_t_us"] = round(tp * 1e6, 1)
        log(f"{mode}: plan {t_plan:.1f}s, {t*1e6:.1f} us -> "
            f"{gbs:.2f} GB/s (min-bytes){extra}")
        out[f"{mode}_gbs"] = round(gbs, 2)
        out[f"{mode}_t_us"] = round(t * 1e6, 1)

    if graph != "ba":
        # one-shot end-to-end for the SHIPPED default (VERDICT r4 item
        # 7): the full apply, transports included.  Two presentations
        # of the same operator: the shuffled kNN input above engages
        # RCM + sort transports (sell_gbs IS that end-to-end number),
        # and the SAME matrix presented in its RCM order — the
        # mesh-ordered/banded case the identity-first packing exists
        # for — runs with ZERO n-sized transports.
        from tpusparse.symbolic.rcm import rcm
        from tpusparse.core.ops import permute
        from tpusparse.core.perm import pinv as _pinv
        p = rcm(A)
        Ar = permute(A, _pinv(p), p, values=True)
        pr = spmv_plan(Ar, mode="sell")
        ident = bool((np.asarray(pr.perm) == np.arange(A.n)).all())
        tr = measure(pr, Ar.n, jax, jnp)
        gbr = pr.bytes_min / tr / 1e9
        log(f"one-shot, low-bandwidth presentation (identity={ident}):"
            f" {tr*1e6:.1f} us -> {gbr:.2f} GB/s end-to-end")
        out["oneshot_lowbw_gbs"] = round(gbr, 2)
        out["oneshot_lowbw_identity"] = ident
        out["oneshot_shuffled_gbs"] = out.get("sell_gbs")

    # DIA reference (banded): the relay-floor comparator
    gs = int(round(n ** 0.5))
    Ab, _ = grid_spd(gs)
    pd = spmv_plan(Ab, mode="dia")
    td = measure(pd, Ab.n, jax, jnp)
    dia_gbs = pd.bytes_min / td / 1e9
    log(f"dia (banded ref, n={Ab.n}): {td*1e6:.1f} us -> "
        f"{dia_gbs:.2f} GB/s")
    out["dia_gbs"] = round(dia_gbs, 2)

    lead = "seg_gbs" if graph == "ba" else "sell_gbs"
    # baseline = the best feasible alternative path on this matrix
    alt = max(out.get("ell_gbs", 0.0), out.get("sell_gbs", 0.0)
              if graph == "ba" else 0.0)
    print(json.dumps({
        "metric": ("spmv_powerlaw_gbs" if graph == "ba"
                   else "spmv_irregular_gbs"),
        "value": out[lead],
        "unit": "GB/s(min-bytes)",
        "vs_baseline": round(out[lead] / max(
            alt if graph == "ba" else out.get("ell_gbs", 0.0), 1e-9),
            2),
        "n": A.n,
        "nnz": A.nnz,
        **out,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
