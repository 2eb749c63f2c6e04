#!/usr/bin/env python
"""demo2: the reference's regression driver (SURVEY.md §3.5) — dmperm
stats + QR/LU/Cholesky solves with residual table.

Usage: python cs_demo2.py data/<matrix> [--tpu] [--engine ENG]
       python cs_demo2.py --all [--tpu] [--engine ENG]

--engine host        : host f64 engine (default without --tpu)
--engine tpu         : device engines, default Cholesky (supernodal)
--engine tiled       : device engines, fixed-tile Cholesky
--engine supernodal  : device engines, level-unrolled supernodal Cholesky
--engine superscan   : device engines, scan-ified supernodal Cholesky
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpusparse.demo import demo2, get_problem

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")
SUITE = ["t1", "bcsstk01", "fs_183_1", "west0479", "ash219", "lp_afiro",
         "ibm32a", "ibm32b", "mbeacxc", "bcsstk16"]


def run(path, engine=None):
    if not os.path.exists(path):
        print(f"cs_demo2: no such matrix file: {path}", file=sys.stderr)
        return None
    name = os.path.basename(path)
    with open(path) as fh:
        prob = get_problem(fh, tol=1e-14 if name != "t1" else 0.0)
    print(f"\n--- Matrix: {name} ({prob.A.m}-by-{prob.A.n}, "
          f"nnz: {prob.A.nnz}, sym: {prob.sym}) ---")
    return demo2(prob, engine=engine)


def main():
    args = [a for a in sys.argv[1:]]
    engine = None
    want_device = False
    if "--tpu" in args:
        args.remove("--tpu")
        want_device = True
    if "--engine" in args:
        i = args.index("--engine")
        try:
            choice = args[i + 1]
        except IndexError:
            print("cs_demo2: --engine needs an argument "
                  "(host|tpu|tiled|supernodal)", file=sys.stderr)
            return 1
        del args[i:i + 2]
        if choice == "host":
            want_device = False
        elif choice in ("tpu", "tiled", "supernodal", "superscan"):
            want_device = True
            if choice != "tpu":
                os.environ["TPUSPARSE_CHOL_ENGINE"] = choice
        else:
            print(f"cs_demo2: unknown engine '{choice}' "
                  "(host|tpu|tiled|supernodal|superscan)", file=sys.stderr)
            return 1
    if want_device:
        from tpusparse.device import solvers as engine
    if args and args[0] == "--all":
        for name in SUITE:
            p = os.path.join(DATA, name)
            if os.path.exists(p):
                run(p, engine)
    elif args:
        run(args[0], engine)
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
