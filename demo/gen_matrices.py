"""Generate the demo matrix suite into data/.

The reference ships ~10 small matrices (SURVEY.md §2.3).  The mount was
empty, so per SURVEY.md §7.4(5) we regenerate: t1 EXACTLY (its content is
published in Davis SIAM 2006 ch. 2 and reproduced in SURVEY.md §2.3), and
deterministic role-equivalents for the rest (same dims, same structural
properties: SPD / unsymmetric / ill-conditioned / rectangular /
underdetermined / pattern-only / structurally singular).  The loader also
reads real SuiteSparse triplet files, so originals drop in if obtained.
"""

import os

import numpy as np
import scipy.sparse as sp

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(os.path.dirname(HERE), "data")


def write_triplet(name, rows, cols, vals=None, pattern=False):
    path = os.path.join(DATA, name)
    with open(path, "w") as fh:
        for k in range(len(rows)):
            if pattern:
                fh.write(f"{rows[k]} {cols[k]} 1\n")
            else:
                fh.write(f"{rows[k]} {cols[k]} {vals[k]:.17g}\n")
    print(f"wrote {path} ({len(rows)} entries)")


def tril_of(S):
    C = sp.tril(S).tocoo()
    return C.row, C.col, C.data


def t1():
    # exact content from Davis SIAM 2006 ch.2 (SURVEY.md §2.3)
    entries = [(2, 2, 3.0), (1, 0, 3.1), (3, 3, 1.0), (0, 2, 3.2),
               (1, 1, 2.9), (3, 0, 3.5), (3, 1, 0.4), (1, 3, 0.9),
               (0, 0, 4.5), (2, 1, 1.7)]
    r, c, v = zip(*[(e[0], e[1], e[2]) for e in entries])
    write_triplet("t1", r, c, np.array(v))


def spd_band(name, n, bw, seed):
    """bcsstk01/bcsstk16-class: SPD banded stiffness-like matrix, stored
    lower-triangular (Harwell-Boeing symmetric convention)."""
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for j in range(n):
        for i in range(j, min(n, j + bw)):
            if i == j:
                continue
            if rng.random() < 0.55:
                rows.append(i)
                cols.append(j)
                vals.append(rng.normal())
    S = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsc()
    full = S + S.T
    # diagonal dominance => SPD
    d = np.abs(full).sum(axis=1).A1 + 1.0 if hasattr(
        np.abs(full).sum(axis=1), "A1") else np.asarray(
        np.abs(full).sum(axis=1)).ravel() + 1.0
    M = (full + sp.diags(d)).tocoo()
    r, c, v = tril_of(M.tocsc())
    write_triplet(name, r, c, v)


def unsym(name, n, density, seed, ill=False):
    """fs_183_1 / west0479-class: square unsymmetric; ``ill`` scales rows
    over 10 orders of magnitude and zeroes some diagonal entries to force
    off-diagonal pivoting."""
    rng = np.random.default_rng(seed)
    S = sp.random(n, n, density=density,
                  random_state=np.random.RandomState(seed)).tocsc()
    S = (S + sp.diags(rng.normal(size=n) + 2.0)).tocsc()
    if ill:
        scale = 10.0 ** rng.uniform(-5, 5, size=n)
        S = (sp.diags(scale) @ S).tocsc()
        # kill some diagonal entries (classic west0479 pivoting stress),
        # but keep structural full rank via a superdiagonal cycle
        d = S.toarray()
        kill = rng.choice(n, n // 8, replace=False)
        d[kill, kill] = 0.0
        cyc = (np.arange(n) + 1) % n
        d[np.arange(n), cyc] += rng.normal(size=n) * 0.5
        S = sp.csc_matrix(d)
    C = S.tocoo()
    write_triplet(name, C.row, C.col, C.data)


def rect(name, m, n, density, seed):
    """ash219-class: rectangular least-squares matrix, full column rank."""
    rng = np.random.default_rng(seed)
    S = sp.random(m, n, density=density,
                  random_state=np.random.RandomState(seed)).tocsc()
    # ensure structural full column rank: one guaranteed entry per column
    rows = rng.permutation(m)[:n]
    S = (S + sp.coo_matrix((np.full(n, 2.0), (rows, np.arange(n))),
                           shape=(m, n))).tocsc()
    S = (S + sp.coo_matrix(([1e-30], ([m - 1], [n - 1])),
                           shape=(m, n))).tocoo()
    write_triplet(name, S.row, S.col, S.data)


def pattern_pair():
    """ibm32a/ibm32b-class: 32x31 pattern matrix and its transpose."""
    rng = np.random.default_rng(32)
    S = sp.random(32, 31, density=0.12,
                  random_state=np.random.RandomState(32)).tocoo()
    S = (sp.coo_matrix((np.ones(31), (np.arange(31), np.arange(31))),
                       shape=(32, 31)) + S.tocsc()).tocoo()
    write_triplet("ibm32a", S.row, S.col, pattern=True)
    T = S.T.tocoo()
    write_triplet("ibm32b", T.row, T.col, pattern=True)


def singular(name, n, seed):
    """mbeacxc-class: structurally singular square matrix (sprank < n):
    several empty rows AND duplicated column patterns."""
    rng = np.random.default_rng(seed)
    S = sp.random(n, n, density=0.01,
                  random_state=np.random.RandomState(seed)).tolil()
    empty = rng.choice(n, max(3, n // 50), replace=False)
    for i in empty:
        S[i, :] = 0
        S[:, i] = 0
    C = S.tocoo()
    write_triplet(name, C.row, C.col, C.data)


def lp(name, m, n, seed):
    """lp_afiro-class: underdetermined LP constraint matrix (m < n)."""
    rng = np.random.default_rng(seed)
    S = sp.random(m, n, density=0.08,
                  random_state=np.random.RandomState(seed)).tocsc()
    cols = rng.permutation(n)[:m]
    S = (S + sp.coo_matrix((np.full(m, 1.5), (np.arange(m), cols)),
                           shape=(m, n))).tocsc()
    # pin the corner so the loader infers the full (m, n) shape
    S = (S + sp.coo_matrix(([1e-30], ([m - 1], [n - 1])),
                           shape=(m, n))).tocoo()
    write_triplet(name, S.row, S.col, S.data)


def main():
    os.makedirs(DATA, exist_ok=True)
    t1()
    spd_band("bcsstk01", 48, 8, seed=48)
    spd_band("bcsstk16", 4884, 12, seed=4884)
    unsym("fs_183_1", 183, 0.03, seed=183)
    unsym("west0479", 479, 0.008, seed=479, ill=True)
    rect("ash219", 219, 85, 0.02, seed=219)
    lp("lp_afiro", 27, 51, seed=27)
    pattern_pair()
    singular("mbeacxc", 496, seed=496)


if __name__ == "__main__":
    main()
