#!/usr/bin/env python
"""Plan-only metrics for the superscan schedule (no device execution):
waste, occupancy, program count, ladder bodies.  Used to A/B planner
changes (ladder rung optimization, branch budgets) before paying
hardware compiles."""

import argparse
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="3d", choices=["2d", "3d", "3dof"])
    ap.add_argument("--n", type=int, default=13824)
    ap.add_argument("--dof", type=int, default=3)
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--max-segments", type=int, default=30)
    args = ap.parse_args()

    import bench as _b
    from tpusparse.device.superscan import plan_superscan

    if args.grid == "3d":
        g = int(round(args.n ** (1.0 / 3.0)))
        A, _ = _b.grid_spd_3d(g)
    elif args.grid == "3dof":
        g = int(round((args.n / args.dof) ** (1.0 / 3.0)))
        A, _ = _b.grid_spd_3d_dof(g, args.dof)
    else:
        g = int(round(args.n ** 0.5))
        A, _ = _b.grid_spd(g)
    t0 = time.perf_counter()
    plan = plan_superscan(A, order=args.order,
                          max_segments=args.max_segments)
    t_plan = time.perf_counter() - t0
    print(f"grid={args.grid} n={A.n} plan={t_plan:.1f}s "
          f"segments={len(plan.segments)} "
          f"programs={plan.n_program_sigs} "
          f"bodies={plan.n_ladder_bodies}")
    print(f"waste={plan.waste_ratio:.4f} "
          f"occupancy={plan.slot_occupancy:.4f} "
          f"issued={plan.flops_padded/1e9:.2f}G "
          f"true={plan.flops_true/1e9:.2f}G")


if __name__ == "__main__":
    main()
