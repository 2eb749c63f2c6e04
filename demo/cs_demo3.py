#!/usr/bin/env python
"""demo3: Cholesky update/downdate regression (reference: cs_demo3.py;
SURVEY.md §2.3).

Usage: python cs_demo3.py data/bcsstk01 [data/bcsstk16 ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpusparse.demo import demo3, get_problem

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")


def main():
    args = list(sys.argv[1:])
    engine = "host"
    if "--tpu" in args:
        args.remove("--tpu")
        engine = "tpu"
    paths = args or [os.path.join(DATA, "bcsstk01"),
                     os.path.join(DATA, "bcsstk16")]
    for path in paths:
        if not os.path.exists(path):
            print(f"cs_demo3: no such matrix file: {path}", file=sys.stderr)
            continue
        print(f"\n--- Matrix: {os.path.basename(path)} ---")
        with open(path) as fh:
            prob = get_problem(fh, tol=1e-14)
        demo3(prob, engine=engine)
    return 0


if __name__ == "__main__":
    sys.exit(main())
