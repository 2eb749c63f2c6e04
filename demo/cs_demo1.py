#!/usr/bin/env python
"""demo1: L0/L1 round-trip on t1 (reference: cs_demo1.py; SURVEY.md §2.3,
BASELINE.json configs[0]).

Load t1 from stdin or argv, print T, A = compress(T), AT = A',
C = A*A', D = C + beta*Eye — exercising entry/compress/transpose/
multiply/add/print.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tpusparse.api import (cs_add, cs_compress, cs_entry, cs_load,
                           cs_multiply, cs_norm, cs_print, cs_spalloc,
                           cs_transpose)


def main():
    fh = open(sys.argv[1]) if len(sys.argv) > 1 else sys.stdin
    T = cs_load(fh)
    print("T:")
    cs_print(T)
    A = cs_compress(T)
    print("A:")
    cs_print(A)
    AT = cs_transpose(A)
    print("AT:")
    cs_print(AT)
    m = A.m
    Eye = cs_spalloc(m, m, m, True, True)
    for i in range(m):
        cs_entry(Eye, i, i, 1.0)
    Eye = cs_compress(Eye)
    C = cs_multiply(A, AT)
    print("C = A*A':")
    cs_print(C)
    D = cs_add(C, Eye, 1.0, cs_norm(C))       # D = C + Eye*norm(C,1)
    print("D = C + Eye*norm(C,1):")
    cs_print(D)
    return 0


if __name__ == "__main__":
    sys.exit(main())
