// Native host planner: the per-pattern symbolic hot path in C++.
//
// The reference (rwl/CSparse.py) is pure Python (SURVEY.md §2.4); this
// framework keeps Python as the fallback and moves the pointer-chasing
// symbolic planning (elimination tree, postorder, column counts, AMD) to
// native code — these run once per sparsity pattern on host and dominate
// planning time for large patterns. Exposed via ctypes
// (tpusparse/native/__init__.py); every routine mirrors the tested
// Python implementation in tpusparse/symbolic.
//
// Build: g++ -O3 -fPIC -shared planner.cpp -o libtsplanner.so
// (done automatically on first import; see native/__init__.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

typedef int64_t i64;

extern "C" {

// ---------------------------------------------------------------- etree
// Elimination tree of A (upper used) or column etree of A'A (ata != 0).
// Mirrors tpusparse.symbolic.etree.etree / csparse::cs_etree.
void ts_etree(i64 m, i64 n, const i64 *Ap, const i64 *Ai, int ata,
              i64 *parent) {
  std::vector<i64> ancestor(n, -1), prev;
  if (ata) prev.assign(m, -1);
  for (i64 k = 0; k < n; k++) parent[k] = -1;
  for (i64 k = 0; k < n; k++) {
    for (i64 p = Ap[k]; p < Ap[k + 1]; p++) {
      i64 i = ata ? prev[Ai[p]] : Ai[p];
      while (i != -1 && i < k) {
        i64 inext = ancestor[i];
        ancestor[i] = k;
        if (inext == -1) parent[i] = k;
        i = inext;
      }
      if (ata) prev[Ai[p]] = k;
    }
  }
}

// ---------------------------------------------------------------- tdfs
static i64 tdfs(i64 j, i64 k, i64 *head, i64 *next, i64 *order,
                i64 *stack) {
  i64 top = 0;
  stack[0] = j;
  while (top >= 0) {
    i64 p = stack[top];
    i64 i = head[p];
    if (i == -1) {
      top--;
      order[k++] = p;
    } else {
      head[p] = next[i];
      stack[++top] = i;
    }
  }
  return k;
}

// ---------------------------------------------------------------- post
void ts_post(i64 n, const i64 *parent, i64 *order) {
  std::vector<i64> head(n, -1), next(n, -1), stack(n, 0);
  for (i64 j = n - 1; j >= 0; j--) {
    if (parent[j] == -1) continue;
    next[j] = head[parent[j]];
    head[parent[j]] = j;
  }
  i64 k = 0;
  for (i64 j = 0; j < n; j++) {
    if (parent[j] != -1) continue;
    k = tdfs(j, k, head.data(), next.data(), order, stack.data());
  }
}

// ---------------------------------------------------------------- counts
static i64 leaf(i64 i, i64 j, i64 *first, i64 *maxfirst, i64 *prevleaf,
                i64 *ancestor, int *jleaf) {
  *jleaf = 0;
  if (i <= j || first[j] <= maxfirst[i]) return -1;
  maxfirst[i] = first[j];
  i64 jprev = prevleaf[i];
  prevleaf[i] = j;
  *jleaf = (jprev == -1) ? 1 : 2;
  if (*jleaf == 1) return i;
  i64 q = jprev;
  while (q != ancestor[q]) q = ancestor[q];
  i64 s = jprev;
  while (s != q) {
    i64 sp = ancestor[s];
    ancestor[s] = q;
    s = sp;
  }
  return q;
}

// Column counts of chol(A) (ata=0) or chol(A'A) / R of QR (ata=1).
// Caller passes A (m x n, CSC) — the transpose is built internally.
void ts_counts(i64 m, i64 n, const i64 *Ap, const i64 *Ai,
               const i64 *parent, const i64 *post, int ata, i64 *colcount) {
  i64 nnz = Ap[n];
  // AT = transpose of the pattern (counting sort)
  std::vector<i64> ATp(m + 2, 0), ATi(nnz);
  for (i64 p = 0; p < nnz; p++) ATp[Ai[p] + 2]++;
  for (i64 i = 2; i < m + 2; i++) ATp[i] += ATp[i - 1];
  for (i64 j = 0; j < n; j++)
    for (i64 p = Ap[j]; p < Ap[j + 1]; p++) ATi[ATp[Ai[p] + 1]++] = j;
  std::vector<i64> ancestor(n), maxfirst(n, -1), prevleaf(n, -1),
      first(n, -1), delta(n, 0);
  for (i64 k = 0; k < n; k++) {
    i64 j = post[k];
    delta[j] = (first[j] == -1) ? 1 : 0;
    while (j != -1 && first[j] == -1) {
      first[j] = k;
      j = parent[j];
    }
  }
  std::vector<i64> head, next_;
  if (ata) {
    std::vector<i64> invpost(n);
    for (i64 k = 0; k < n; k++) invpost[post[k]] = k;
    head.assign(n + 1, -1);
    next_.assign(m, -1);
    for (i64 i = 0; i < m; i++) {
      i64 k = n;
      for (i64 p = ATp[i]; p < ATp[i + 1]; p++)
        k = std::min(k, invpost[ATi[p]]);
      next_[i] = head[k];
      head[k] = i;
    }
  }
  for (i64 i = 0; i < n; i++) ancestor[i] = i;
  for (i64 k = 0; k < n; k++) {
    i64 j = post[k];
    if (parent[j] != -1) delta[parent[j]]--;
    i64 J = ata ? head[k] : j;
    while (J != -1) {
      for (i64 p = ATp[J]; p < ATp[J + 1]; p++) {
        int jl;
        i64 q = leaf(ATi[p], j, first.data(), maxfirst.data(),
                     prevleaf.data(), ancestor.data(), &jl);
        if (jl >= 1) delta[j]++;
        if (jl == 2) delta[q]--;
      }
      J = ata ? next_[J] : -1;
    }
    if (parent[j] != -1) ancestor[j] = parent[j];
  }
  for (i64 j = 0; j < n; j++) colcount[j] = delta[j];
  for (i64 j = 0; j < n; j++)
    if (parent[j] != -1) colcount[parent[j]] += colcount[j];
}

// ---------------------------------------------------------------- amd
// Quotient-graph AMD core; caller passes the symmetric pattern C
// (diagonal removed) — mirrors tpusparse.symbolic.amd.amd (the published
// Amestoy-Davis-Duff algorithm). Returns 0 on success.
static inline i64 flip(i64 i) { return -i - 2; }

static i64 wclear(i64 mark, i64 lemax, i64 *w, i64 n) {
  if (mark < 2 || mark + lemax < 0) {
    for (i64 k = 0; k < n; k++)
      if (w[k] != 0) w[k] = 1;
    mark = 2;
  }
  return mark;
}

int ts_amd_core(i64 n, const i64 *Cp_in, const i64 *Ci_in, i64 *perm_out) {
  if (n == 0) return 0;
  i64 cnz = Cp_in[n];
  i64 t = cnz + cnz / 5 + 2 * n;
  i64 N = n + 1;
  std::vector<i64> Cp(N, 0), Ci(std::max<i64>(t, 1), 0);
  for (i64 i = 0; i <= n; i++) Cp[i] = Cp_in[i];
  for (i64 p = 0; p < cnz; p++) Ci[p] = Ci_in[p];
  i64 nzmax = (i64)Ci.size();
  std::vector<i64> len(N, 0), nv(N, 1), next_(N, -1), head(N, -1),
      elen(N, 0), degree(N, 0), w(N, 1), hhead(N, -1), last(N, -1);
  for (i64 k = 0; k < n; k++) len[k] = Cp[k + 1] - Cp[k];
  len[n] = 0;
  i64 dense = std::max<i64>(16, (i64)(10 * std::sqrt((double)n)));
  dense = std::min(n - 2, dense);
  if (dense < 0) dense = 0;
  for (i64 i = 0; i < N; i++) degree[i] = len[i];
  i64 mark = wclear(0, 0, w.data(), n);
  elen[n] = -2;
  Cp[n] = -1;
  w[n] = 0;
  i64 nel = 0, mindeg = 0, lemax = 0;
  for (i64 i = 0; i < n; i++) {
    i64 d = degree[i];
    if (d == 0) {
      elen[i] = -2;
      nel++;
      Cp[i] = -1;
      w[i] = 0;
    } else if (d > dense) {
      nv[i] = 0;
      elen[i] = -1;
      nel++;
      Cp[i] = flip(n);
      nv[n]++;
    } else {
      if (head[d] != -1) last[head[d]] = i;
      next_[i] = head[d];
      head[d] = i;
    }
  }
  i64 cnz_cur = cnz;
  while (nel < n) {
    i64 k = -1;
    while (mindeg < n && (k = head[mindeg]) == -1) mindeg++;
    if (k < 0) return 1;  // should not happen
    if (next_[k] != -1) last[next_[k]] = -1;
    head[mindeg] = next_[k];
    i64 elenk = elen[k];
    i64 nvk = nv[k];
    nel += nvk;
    // garbage collection
    if (elenk > 0 && cnz_cur + mindeg >= nzmax) {
      for (i64 j = 0; j < n; j++) {
        i64 p = Cp[j];
        if (p >= 0) {
          Cp[j] = Ci[p];
          Ci[p] = flip(j);
        }
      }
      i64 q = 0, p = 0;
      while (p < cnz_cur) {
        i64 jf = flip(Ci[p++]);
        if (jf >= 0) {
          Ci[q] = Cp[jf];
          Cp[jf] = q++;
          for (i64 k3 = 0; k3 < len[jf] - 1; k3++) Ci[q++] = Ci[p++];
        }
      }
      cnz_cur = q;
    }
    // construct new element
    i64 dk = 0;
    nv[k] = -nvk;
    i64 p = Cp[k];
    i64 pk1 = (elenk == 0) ? p : cnz_cur;
    i64 pk2 = pk1;
    for (i64 k1 = 1; k1 <= elenk + 1; k1++) {
      i64 e, pj, ln;
      if (k1 > elenk) {
        e = k;
        pj = p;
        ln = len[k] - elenk;
      } else {
        e = Ci[p++];
        pj = Cp[e];
        ln = len[e];
      }
      for (i64 k2 = 0; k2 < ln; k2++) {
        i64 i = Ci[pj++];
        i64 nvi = nv[i];
        if (nvi <= 0) continue;
        dk += nvi;
        nv[i] = -nvi;
        Ci[pk2++] = i;
        if (next_[i] != -1) last[next_[i]] = last[i];
        if (last[i] != -1)
          next_[last[i]] = next_[i];
        else
          head[degree[i]] = next_[i];
      }
      if (e != k) {
        Cp[e] = flip(k);
        w[e] = 0;
      }
    }
    if (elenk != 0) cnz_cur = pk2;
    degree[k] = dk;
    Cp[k] = pk1;
    len[k] = pk2 - pk1;
    elen[k] = -2;
    // set differences
    mark = wclear(mark, lemax, w.data(), n);
    for (i64 pk = pk1; pk < pk2; pk++) {
      i64 i = Ci[pk];
      i64 eln = elen[i];
      if (eln <= 0) continue;
      i64 nvi = -nv[i];
      i64 wnvi = mark - nvi;
      for (i64 pp = Cp[i]; pp < Cp[i] + eln; pp++) {
        i64 e = Ci[pp];
        if (w[e] >= mark)
          w[e] -= nvi;
        else if (w[e] != 0)
          w[e] = degree[e] + wnvi;
      }
    }
    // degree update
    for (i64 pk = pk1; pk < pk2; pk++) {
      i64 i = Ci[pk];
      i64 p1 = Cp[i];
      i64 p2 = p1 + elen[i] - 1;
      i64 pn = p1;
      i64 h = 0, d = 0;
      for (i64 pp = p1; pp <= p2; pp++) {
        i64 e = Ci[pp];
        if (w[e] != 0) {
          i64 dext = w[e] - mark;
          if (dext > 0) {
            d += dext;
            Ci[pn++] = e;
            h += e;
          } else {
            Cp[e] = flip(k);
            w[e] = 0;
          }
        }
      }
      elen[i] = pn - p1 + 1;
      i64 p3 = pn;
      i64 p4 = p1 + len[i];
      for (i64 pp = p2 + 1; pp < p4; pp++) {
        i64 j = Ci[pp];
        i64 nvj = nv[j];
        if (nvj <= 0) continue;
        d += nvj;
        Ci[pn++] = j;
        h += j;
      }
      if (d == 0) {
        Cp[i] = flip(k);
        i64 nvi = -nv[i];
        dk -= nvi;
        nvk += nvi;
        nel += nvi;
        nv[i] = 0;
        elen[i] = -1;
      } else {
        degree[i] = std::min(degree[i], d);
        Ci[pn] = Ci[p3];
        Ci[p3] = Ci[p1];
        Ci[p1] = k;
        len[i] = pn - p1 + 1;
        h = ((h % n) + n) % n;
        next_[i] = hhead[h];
        hhead[h] = i;
        last[i] = h;
      }
    }
    degree[k] = dk;
    lemax = std::max(lemax, dk);
    mark = wclear(mark + lemax, lemax, w.data(), n);
    // supernode detection
    for (i64 pk = pk1; pk < pk2; pk++) {
      i64 i = Ci[pk];
      if (nv[i] >= 0) continue;
      i64 h = last[i];
      i = hhead[h];
      hhead[h] = -1;
      while (i != -1 && next_[i] != -1) {
        i64 ln = len[i];
        i64 eln = elen[i];
        for (i64 pp = Cp[i] + 1; pp < Cp[i] + ln; pp++) w[Ci[pp]] = mark;
        i64 jlast = i;
        i64 j = next_[i];
        while (j != -1) {
          int ok = (len[j] == ln) && (elen[j] == eln);
          if (ok) {
            for (i64 pp = Cp[j] + 1; pp < Cp[j] + ln; pp++) {
              if (w[Ci[pp]] != mark) {
                ok = 0;
                break;
              }
            }
          }
          if (ok) {
            Cp[j] = flip(i);
            nv[i] += nv[j];
            nv[j] = 0;
            elen[j] = -1;
            j = next_[j];
            next_[jlast] = j;
          } else {
            jlast = j;
            j = next_[j];
          }
        }
        i = next_[i];
        mark++;
      }
    }
    // finalize element k
    p = pk1;
    for (i64 pk = pk1; pk < pk2; pk++) {
      i64 i = Ci[pk];
      i64 nvi = -nv[i];
      if (nvi <= 0) continue;
      nv[i] = nvi;
      i64 d = degree[i] + dk - nvi;
      d = std::min(d, n - nel - nvi);
      if (head[d] != -1) last[head[d]] = i;
      next_[i] = head[d];
      last[i] = -1;
      head[d] = i;
      mindeg = std::min(mindeg, d);
      degree[i] = d;
      Ci[p++] = i;
    }
    nv[k] = nvk;
    len[k] = p - pk1;
    if (len[k] == 0) {
      Cp[k] = -1;
      w[k] = 0;
    }
    if (elenk != 0) cnz_cur = p;
  }
  // postorder the assembly tree
  for (i64 i = 0; i < N; i++) Cp[i] = flip(Cp[i]);
  for (i64 j = 0; j < N; j++) head[j] = -1;
  for (i64 j = n; j >= 0; j--) {
    if (nv[j] > 0) continue;
    next_[j] = head[Cp[j]];
    head[Cp[j]] = j;
  }
  for (i64 e = n; e >= 0; e--) {
    if (nv[e] <= 0) continue;
    if (Cp[e] != -1) {
      next_[e] = head[Cp[e]];
      head[Cp[e]] = e;
    }
  }
  std::vector<i64> order(N, 0), stack(N, 0);
  i64 kk = 0;
  for (i64 i = 0; i < N; i++) {
    if (Cp[i] == -1)
      kk = tdfs(i, kk, head.data(), next_.data(), order.data(),
                stack.data());
  }
  i64 outp = 0;
  for (i64 i = 0; i < N; i++) {
    if (order[i] != n) perm_out[outp++] = order[i];
    if (outp == n) break;
  }
  return 0;
}

// ------------------------------------------------------------- ereach
// Batched symbolic Cholesky: all row patterns of L (the cs_ereach loop
// over every k) in one native pass. Outputs CSR-ish: rowptr (n+1) then
// pattern entries; caller sizes entries via the counts routine.
void ts_rowpatterns(i64 n, const i64 *Ap, const i64 *Ai, const i64 *parent,
                    i64 *rowptr, i64 *entries) {
  std::vector<i64> s(n), w(n, 0);
  std::vector<char> mark(n, 0);
  i64 q = 0;
  for (i64 k = 0; k < n; k++) {
    rowptr[k] = q;
    i64 top = n;
    mark[k] = 1;
    for (i64 p = Ap[k]; p < Ap[k + 1]; p++) {
      i64 i = Ai[p];
      if (i > k) continue;
      i64 length = 0;
      while (!mark[i]) {
        s[length++] = i;
        mark[i] = 1;
        i = parent[i];
      }
      while (length > 0) s[--top] = s[--length];
    }
    for (i64 p = top; p < n; p++) {
      entries[q++] = s[p];
      mark[s[p]] = 0;
    }
    mark[k] = 0;
  }
  rowptr[n] = q;
}

}  // extern "C"

// ---------------------------------------------------------------- numeric
extern "C" {

// Up-looking numeric Cholesky (mirrors tpusparse.numeric.chol.chol /
// csparse::cs_chol): C is the permuted full-symmetric CSC (f64), cp the
// L column pointers from the symbolic phase, parent the etree.
// Outputs Li/Lx sized cp[n]. Returns 0 on success, k+1 if the matrix is
// not positive definite at column k.
long ts_chol_numeric(i64 n, const i64 *Cp, const i64 *Ci, const double *Cx,
                     const i64 *cp, const i64 *parent, i64 *Li,
                     double *Lx) {
  std::vector<i64> Lp(cp, cp + n + 1), c(cp, cp + n);
  std::vector<double> x(n, 0.0);
  std::vector<i64> s(n);
  std::vector<char> w(n, 0);
  for (i64 k = 0; k < n; k++) {
    // ereach: pattern of L(k, :) in topological order
    i64 top = n;
    w[k] = 1;
    for (i64 p = Cp[k]; p < Cp[k + 1]; p++) {
      i64 i = Ci[p];
      if (i > k) continue;
      i64 len = 0;
      while (!w[i]) {
        s[len++] = i;
        w[i] = 1;
        i = parent[i];
      }
      while (len > 0) s[--top] = s[--len];
    }
    // x = full(triu(C(:,k)))
    double d = 0.0;
    for (i64 p = Cp[k]; p < Cp[k + 1]; p++) {
      i64 i = Ci[p];
      if (i < k)
        x[i] = Cx[p];
      else if (i == k)
        d = Cx[p];
    }
    for (i64 pp = top; pp < n; pp++) {
      i64 i = s[pp];
      w[i] = 0;                        // unmark while traversing
      double lki = x[i] / Lx[Lp[i]];
      x[i] = 0.0;
      for (i64 p = Lp[i] + 1; p < c[i]; p++) x[Li[p]] -= Lx[p] * lki;
      d -= lki * lki;
      i64 p = c[i]++;
      Li[p] = k;
      Lx[p] = lki;
    }
    w[k] = 0;
    if (d <= 0) return k + 1;          // not positive definite
    i64 p = c[k]++;
    Li[p] = k;
    Lx[p] = std::sqrt(d);
  }
  return 0;
}

// dense-RHS triangular solves on CSC L (diag first per column)
void ts_lsolve(i64 n, const i64 *Lp, const i64 *Li, const double *Lx,
               double *x) {
  for (i64 j = 0; j < n; j++) {
    x[j] /= Lx[Lp[j]];
    for (i64 p = Lp[j] + 1; p < Lp[j + 1]; p++) x[Li[p]] -= Lx[p] * x[j];
  }
}

void ts_ltsolve(i64 n, const i64 *Lp, const i64 *Li, const double *Lx,
                double *x) {
  for (i64 j = n - 1; j >= 0; j--) {
    for (i64 p = Lp[j] + 1; p < Lp[j + 1]; p++) x[j] -= Lx[p] * x[Li[p]];
    x[j] /= Lx[Lp[j]];
  }
}

}  // extern "C"

// ------------------------------------------------- superscan pair builder
extern "C" {

// Update-pair construction for the scan-ified supernodal scheduler
// (mirrors the python pair loop in tpusparse.device.superscan.
// plan_superscan).  Panels are contiguous column ranges ordered by c0,
// so col2p over each panel's SORTED od rows is non-decreasing: targets
// appear as runs, in the same (sorted) order numpy.unique yields.
//
// mode 0: count -> sizes[3] = {npairs, nI, nL}
// mode 1: fill  -> pr_d/pr_s (npairs), pr_Iptr/pr_Lptr (npairs+1),
//   I_pos (od position in d), I_tgt (>=0: diag-local row; <0: od
//   position q encoded as -(q+1)), I_dg, L_pos (od position in d),
//   L_col (target-local column), levels[npan].
void ts_ss_pairs(i64 npan, i64 n, const i64 *c0, const i64 *w,
                 const i64 *rowptr, const i64 *rows, const i64 *col2p,
                 int mode, i64 *sizes, i64 *pr_d, i64 *pr_s,
                 i64 *pr_Iptr, i64 *pr_Lptr, i64 *I_pos, i64 *I_tgt,
                 i64 *I_dg, i64 *L_pos, i64 *L_col, i64 *levels) {
  i64 np_ = 0, nI = 0, nL = 0;
  std::vector<i64> lev(npan, 0);
  for (i64 d = 0; d < npan; d++) {
    const i64 a = rowptr[d], b = rowptr[d + 1];
    i64 i = a;
    while (i < b) {
      const i64 t = col2p[rows[i]];
      i64 j = i;
      while (j < b && col2p[rows[j]] == t) j++;
      if (mode == 1) {
        pr_d[np_] = d;
        pr_s[np_] = t;
        pr_Iptr[np_] = nI;
        pr_Lptr[np_] = nL;
      }
      for (i64 p = i; p < j; p++) {
        if (mode == 1) {
          L_pos[nL] = p - a;
          L_col[nL] = rows[p] - c0[t];
        }
        nL++;
      }
      const i64 tc0 = c0[t], tw = w[t];
      const i64 *ta = rows + rowptr[t];
      const i64 *tb = rows + rowptr[t + 1];
      // both row lists are sorted: a sequential merge walk replaces the
      // per-entry lower_bound (measured hot at 3D scale)
      const i64 *tp = ta;
      for (i64 p = i; p < b; p++) {
        const i64 r = rows[p];
        i64 q, dg;
        if (r < tc0 + tw) {
          q = r - tc0;
          dg = 1;
        } else {
          while (tp < tb && *tp < r) tp++;
          if (tp == tb || *tp != r) continue;    // structurally absent
          q = -((tp - ta) + 1);
          dg = 0;
        }
        if (mode == 1) {
          I_pos[nI] = p - a;
          I_tgt[nI] = q;
          I_dg[nI] = dg;
        }
        nI++;
      }
      if (lev[t] < lev[d] + 1) lev[t] = lev[d] + 1;
      np_++;
      i = j;
    }
  }
  if (mode == 0) {
    sizes[0] = np_;
    sizes[1] = nI;
    sizes[2] = nL;
  } else {
    pr_Iptr[np_] = nI;
    pr_Lptr[np_] = nL;
    for (i64 k = 0; k < npan; k++) levels[k] = lev[k];
  }
}

// Invert row patterns to column patterns (superscan planner): row r
// holds columns entries[rowptr[r]:rowptr[r+1]]; emits CSC-style
// colptr/colrows with rows ascending per column (rows processed in
// order).  O(nnz) counting sort — replaces a 25M-entry numpy argsort.
// (A 256-bucket slab variant was benchmarked 3x SLOWER than this
// direct scatter at 20M entries — hardware prefetching handles the
// random stream fine; earlier contrary measurements were CPU
// contention from concurrent TPU jobs.)
void ts_invert(i64 n, const i64 *rowptr, const i64 *entries,
               i64 *colptr, i64 *colrows) {
  const i64 nnz = rowptr[n];
  for (i64 j = 0; j <= n; j++) colptr[j] = 0;
  for (i64 i = 0; i < nnz; i++) colptr[entries[i] + 1]++;
  for (i64 j = 0; j < n; j++) colptr[j + 1] += colptr[j];
  std::vector<i64> w(colptr, colptr + n);
  for (i64 r = 0; r < n; r++)
    for (i64 p = rowptr[r]; p < rowptr[r + 1]; p++)
      colrows[w[entries[p]]++] = r;
}

// Pattern of A + A' minus the diagonal (CSC, sorted columns) — the
// cs_amd order-1 preamble.  A must be square CSC with sorted columns.
// Returns nnz(C); caller provides Cp (n+1) and Ci with capacity
// 2*nnz(A).
i64 ts_sympat(i64 n, const i64 *Ap, const i64 *Ai, i64 *Cp, i64 *Ci) {
  const i64 nnz = Ap[n];
  // transpose pattern (counting sort keeps columns sorted)
  std::vector<i64> Tp(n + 1, 0), Ti(nnz), w(n);
  for (i64 i = 0; i < nnz; i++) Tp[Ai[i] + 1]++;
  for (i64 j = 0; j < n; j++) Tp[j + 1] += Tp[j];
  for (i64 j = 0; j < n; j++) w[j] = Tp[j];
  for (i64 j = 0; j < n; j++)
    for (i64 p = Ap[j]; p < Ap[j + 1]; p++) Ti[w[Ai[p]]++] = j;
  i64 cnz = 0;
  Cp[0] = 0;
  for (i64 j = 0; j < n; j++) {
    const i64 *a = Ai + Ap[j], *ae = Ai + Ap[j + 1];
    const i64 *b = Ti.data() + Tp[j], *be = Ti.data() + Tp[j + 1];
    while (a < ae || b < be) {
      i64 v;
      if (b == be || (a < ae && *a < *b)) v = *a++;
      else if (a == ae || *b < *a) v = *b++;
      else { v = *a++; b++; }
      if (v != j) Ci[cnz++] = v;
    }
    Cp[j + 1] = cnz;
  }
  return cnz;
}

// Finalize ts_ss_pairs output in place (superscan planner): add the
// descendant's class width W(d) = max(pow2(w), 8) to I/L positions
// (pool-local od rows live at rbase + W + pos) and resolve the target
// encoding (I_tgt >= 0: diagonal row; < 0: od position -(q+1) shifted
// past the target's class width).  Saves five full-array numpy passes.
void ts_ss_finalize(i64 npairs, const i64 *pr_d, const i64 *pr_s,
                    const i64 *Iptr, const i64 *Lptr, const i64 *w,
                    i64 *I_pos, i64 *I_tgt, i64 *L_pos) {
  auto cls = [](i64 x) {
    i64 p = 8;
    while (p < x) p *= 2;
    return p;
  };
  for (i64 k = 0; k < npairs; k++) {
    const i64 Wd = cls(w[pr_d[k]]);
    const i64 Ws = cls(w[pr_s[k]]);
    for (i64 i = Iptr[k]; i < Iptr[k + 1]; i++) {
      I_pos[i] += Wd;
      if (I_tgt[i] < 0) I_tgt[i] = Ws + (-I_tgt[i] - 1);
    }
    for (i64 i = Lptr[k]; i < Lptr[k + 1]; i++) L_pos[i] += Wd;
  }
}

// Relaxed amalgamation of fundamental supernodes (superscan planner):
// greedily merge CONSECUTIVE groups while the merged panel stays dense
// enough (nnz >= tau * rows * width) or narrow (width <= small_w).
// Group i spans columns [starts[i], starts[i+1]); its od rows are
// colrows[colptr[c0] + (c1-1-c0) : colptr[c0+1]] (strictly-lower
// pattern of the group's first column, past the diagonal block).
// mode 0 sizes the outputs; mode 1 fills merged group boundaries
// (mstarts, ng+1 entries) and the ragged merged od lists (odptr ng+1,
// odcat).  Twin of the Python fallback in superscan._build_panels.
void ts_amalg(i64 ngroups, const i64 *starts, const i64 *colptr,
              const i64 *colrows, const i64 *cnt, double tau,
              i64 small_w, i64 wmax, int mode, i64 *sizes,
              i64 *mstarts, i64 *odptr, i64 *odcat) {
  std::vector<i64> cur;   // current merged od rows (sorted)
  std::vector<i64> tmp;
  i64 ng = 0, nod = 0;
  i64 a0 = 0, a1 = 0;     // current merged column range
  i64 nnz = 0;
  auto group_od = [&](i64 i, const i64 *&lo, const i64 *&hi) {
    i64 c0 = starts[i], c1 = starts[i + 1];
    lo = colrows + colptr[c0] + (c1 - 1 - c0);
    hi = colrows + colptr[c0 + 1];
  };
  auto flush = [&]() {
    if (mode == 1) {
      mstarts[ng] = a0;
      odptr[ng] = nod;
      for (size_t q = 0; q < cur.size(); q++) odcat[nod + q] = cur[q];
    }
    nod += (i64)cur.size();
    ng++;
  };
  for (i64 i = 0; i < ngroups; i++) {
    const i64 *glo, *ghi;
    group_od(i, glo, ghi);
    i64 c1 = starts[i + 1];
    i64 gnnz = 0;
    for (i64 j = starts[i]; j < c1; j++) gnnz += cnt[j];
    if (i == 0) {
      a0 = starts[0];
      a1 = c1;
      cur.assign(glo, ghi);
      nnz = gnnz;
      continue;
    }
    i64 w_m = c1 - a0;
    if (w_m <= wmax) {
      // merged od = union(cur, [glo,ghi)) filtered >= c1, both sorted
      tmp.clear();
      const i64 *p1 = cur.data(), *e1 = cur.data() + cur.size();
      const i64 *p2 = glo, *e2 = ghi;
      while (p1 < e1 || p2 < e2) {
        i64 v;
        if (p2 == e2 || (p1 < e1 && *p1 < *p2)) v = *p1++;
        else if (p1 == e1 || *p2 < *p1) v = *p2++;
        else { v = *p1++; p2++; }
        if (v >= c1) tmp.push_back(v);
      }
      i64 r_m = w_m + (i64)tmp.size();
      i64 nnz_m = nnz + gnnz;
      i64 area = r_m * w_m;
      if ((double)nnz_m >= tau * (double)(area > 0 ? area : 1)
          || w_m <= small_w) {
        a1 = c1;
        cur.swap(tmp);
        nnz = nnz_m;
        continue;
      }
    }
    flush();
    a0 = starts[i];
    a1 = c1;
    cur.assign(glo, ghi);
    nnz = gnnz;
  }
  if (ngroups > 0) flush();
  if (mode == 0) {
    sizes[0] = ng;
    sizes[1] = nod;
  } else {
    mstarts[ng] = a1;
    odptr[ng] = nod;
  }
}

// ------------------------------------------- maxtrans / scc / dmperm
// Native twins of tpusparse.symbolic.dmperm (csparse::cs_maxtrans /
// cs_scc / cs_dmperm).  The Python wrappers keep orientation choice,
// seed permutation, and warm-start handling so semantics (and parity
// tests) are bit-identical to the Python implementations.

// Augmenting-path DFS for one column (mirrors dmperm._augment / the
// static cs_augment in cs_maxtrans.c; explicit j/i/position stacks).
static void mt_augment(i64 k, const i64 *Ap, const i64 *Ai, i64 *jmatch,
                       i64 *cheap, i64 *w, i64 *js, i64 *iss, i64 *ps) {
  i64 head = 0;
  js[0] = k;
  bool found = false;
  while (head >= 0) {
    i64 j = js[head];
    if (w[j] != k) {            // first visit to j on path k
      w[j] = k;
      i64 p = cheap[j];
      i64 i = -1;
      while (p < Ap[j + 1]) {   // try a cheap assignment (i, j)
        i = Ai[p];
        p++;
        if (jmatch[i] == -1) {
          found = true;
          break;
        }
      }
      cheap[j] = p;
      if (found) {
        iss[head] = i;
        break;                  // augmenting path complete
      }
      ps[head] = Ap[j];         // no cheap match: start dfs of j
    }
    i64 p = ps[head];
    bool advanced = false;
    while (p < Ap[j + 1]) {
      i64 i = Ai[p];
      // all rows of column j are matched here (cheap pass exhausted
      // the unmatched ones), so jmatch[i] >= 0
      if (w[jmatch[i]] == k) {  // skip if jmatch[i] visited
        p++;
        continue;
      }
      ps[head] = p + 1;         // pause dfs of node j
      iss[head] = i;            // i matched to j if path found
      head++;
      js[head] = jmatch[i];     // continue dfs at jmatch[i]
      advanced = true;
      break;
    }
    if (!advanced) head--;      // node j is done; pop
  }
  if (found)
    for (i64 p = head; p >= 0; p--) jmatch[iss[p]] = js[p];
}

// Cheap/augment pass over columns korder[0..nk) of the m x n CSC
// pattern.  jmatch (len m) must arrive pre-initialized: all -1, or a
// warm-start partial matching (matched pairs are kept; augmenting
// paths reroute them only when necessary).
void ts_maxtrans_core(i64 m, i64 n, const i64 *Ap, const i64 *Ai,
                      i64 nk, const i64 *korder, i64 *jmatch) {
  (void)m;
  std::vector<i64> cheap(Ap, Ap + n), w(n, -1), js(n), iss(n), ps(n);
  for (i64 t = 0; t < nk; t++)
    mt_augment(korder[t], Ap, Ai, jmatch, cheap.data(), w.data(),
               js.data(), iss.data(), ps.data());
}

// Iterative DFS appending nodes in FINISH order; children marked on
// discovery (mirrors symbolic.reach.dfs with pinv=None).
static void scc_dfs(i64 j, const i64 *Gp, const i64 *Gi, char *marked,
                    i64 *sn, i64 *sp, i64 *out, i64 *nout) {
  i64 top = 0;
  sn[0] = j;
  sp[0] = 0;
  marked[j] = 1;
  while (top >= 0) {
    i64 node = sn[top], pos = sp[top];
    top--;
    i64 lo = Gp[node], hi = Gp[node + 1];
    bool advanced = false;
    for (i64 p = lo + pos; p < hi; p++) {
      i64 child = Gi[p];
      if (marked[child]) continue;
      marked[child] = 1;
      top++;
      sn[top] = node;
      sp[top] = p - lo + 1;     // resume here later
      top++;
      sn[top] = child;
      sp[top] = 0;
      advanced = true;
      break;
    }
    if (!advanced) out[(*nout)++] = node;   // node is finished
  }
}

// Kosaraju SCC (twin of symbolic.dmperm.scc): DFS of A for finish
// order, DFS of A' in reverse finish order; components sorted
// naturally within a block, block order reversed so A(p,p) is block
// UPPER triangular.  p_out len n, r_out capacity n+1; returns nb.
i64 ts_scc_core(i64 n, const i64 *Ap, const i64 *Ai, i64 *p_out,
                i64 *r_out) {
  r_out[0] = 0;
  if (n == 0) return 0;
  std::vector<char> marked(n, 0);
  std::vector<i64> sn(n), sp(n), finish(n);
  i64 nf = 0;
  for (i64 i = 0; i < n; i++)
    if (!marked[i])
      scc_dfs(i, Ap, Ai, marked.data(), sn.data(), sp.data(),
              finish.data(), &nf);
  // transpose pattern (counting sort)
  i64 nnz = Ap[n];
  std::vector<i64> Tp(n + 1, 0), Ti(std::max<i64>(nnz, 1)), wk(n);
  for (i64 p = 0; p < nnz; p++) Tp[Ai[p] + 1]++;
  for (i64 j = 0; j < n; j++) Tp[j + 1] += Tp[j];
  for (i64 j = 0; j < n; j++) wk[j] = Tp[j];
  for (i64 j = 0; j < n; j++)
    for (i64 p = Ap[j]; p < Ap[j + 1]; p++) Ti[wk[Ai[p]]++] = j;
  std::fill(marked.begin(), marked.end(), 0);
  std::vector<i64> nodes(n);          // components, discovery order
  std::vector<i64> cptr(1, 0);
  i64 used = 0;
  for (i64 t = n - 1; t >= 0; t--) {
    i64 i = finish[t];
    if (marked[i]) continue;
    i64 start = used;
    scc_dfs(i, Tp.data(), Ti.data(), marked.data(), sn.data(),
            sp.data(), nodes.data(), &used);
    std::sort(nodes.begin() + start, nodes.begin() + used);
    cptr.push_back(used);
  }
  i64 nb = (i64)cptr.size() - 1;
  i64 k = 0, b = 0;
  for (i64 c = nb - 1; c >= 0; c--) {   // reversed discovery order
    for (i64 p = cptr[c]; p < cptr[c + 1]; p++) p_out[k++] = nodes[p];
    r_out[++b] = k;
  }
  return nb;
}

// Alternating-path BFS from unmatched nodes (mirrors the static _bfs /
// cs_bfs): G is A (mark=1, from unmatched cols) or A' (mark=3, from
// unmatched rows) with nq "columns".
static void dm_bfs(i64 nq, const i64 *Gp, const i64 *Gi, i64 *wi,
                   i64 *wj, i64 *queue, const i64 *imatch,
                   const i64 *jmatch, i64 mark) {
  i64 tail = 0;
  for (i64 j = 0; j < nq; j++) {
    if (imatch[j] >= 0) continue;     // skip matched j
    wj[j] = 0;                        // j is in set C0 (R0)
    queue[tail++] = j;
  }
  i64 head = 0;
  while (head < tail) {
    i64 j = queue[head++];
    for (i64 pp = Gp[j]; pp < Gp[j + 1]; pp++) {
      i64 i = Gi[pp];
      if (wi[i] >= 0) continue;
      wi[i] = mark;                   // i in set R1 (C3)
      i64 j2 = jmatch[i];             // alternating path via match
      if (wj[j2] >= 0) continue;
      wj[j2] = mark;                  // j2 in set C1 (R3)
      queue[tail++] = j2;
    }
  }
}

// Full Dulmage-Mendelsohn given a maximum matching (twin of
// symbolic.dmperm.dmperm past the maxtrans call): coarse decomposition
// by alternating BFS, fine decomposition = SCC of the perfectly
// matched square submatrix, combined into block triangular form.
// p len m, q len n, r capacity m+6, s capacity n+6, rr/cc len 5.
// Returns nb.
i64 ts_dmperm_core(i64 m, i64 n, const i64 *Ap, const i64 *Ai,
                   const i64 *jmatch, const i64 *imatch, i64 *p, i64 *q,
                   i64 *r, i64 *s, i64 *rr, i64 *cc) {
  // transpose pattern for the mark=3 BFS
  i64 nnz = Ap[n];
  std::vector<i64> Tp(m + 1, 0), Ti(std::max<i64>(nnz, 1)), wk(m);
  for (i64 pp = 0; pp < nnz; pp++) Tp[Ai[pp] + 1]++;
  for (i64 i = 0; i < m; i++) Tp[i + 1] += Tp[i];
  for (i64 i = 0; i < m; i++) wk[i] = Tp[i];
  for (i64 j = 0; j < n; j++)
    for (i64 pp = Ap[j]; pp < Ap[j + 1]; pp++) Ti[wk[Ai[pp]]++] = j;
  std::vector<i64> wi(m, -1), wj(n, -1);
  for (i64 k = 0; k < 5; k++) rr[k] = cc[k] = 0;
  dm_bfs(n, Ap, Ai, wi.data(), wj.data(), q, imatch, jmatch, 1);
  dm_bfs(m, Tp.data(), Ti.data(), wj.data(), wi.data(), p, jmatch,
         imatch, 3);
  // unmatched set C0
  i64 kc = 0;
  for (i64 j = 0; j < n; j++)
    if (wj[j] == 0) q[kc++] = j;
  cc[1] = kc;
  // matched sets (R1,C1), (R2,C2), (R3,C3)
  const i64 marks[3] = {1, -1, 3};
  for (int which = 1; which <= 3; which++) {
    i64 kc2 = cc[which], kr = rr[which - 1];
    for (i64 j = 0; j < n; j++) {
      if (wj[j] != marks[which - 1]) continue;
      p[kr++] = imatch[j];
      q[kc2++] = j;
    }
    cc[which + 1] = kc2;
    rr[which] = kr;
  }
  // unmatched set R0
  i64 kr = rr[3];
  for (i64 i = 0; i < m; i++)
    if (wi[i] == 0) p[kr++] = i;
  rr[4] = kr;
  // --- fine decomposition: SCC of C(R2, C2), C = A(p, q) -------------
  std::vector<i64> ip(m);
  for (i64 k = 0; k < m; k++) ip[p[k]] = k;
  i64 nc = cc[3] - cc[2], r1 = rr[1], rr2 = rr[2], c2 = cc[2];
  std::vector<i64> Sp(nc + 1, 0), Si;
  Si.reserve(nnz);
  for (i64 jj = 0; jj < nc; jj++) {
    i64 col = q[c2 + jj];
    i64 start = (i64)Si.size();
    for (i64 pp = Ap[col]; pp < Ap[col + 1]; pp++) {
      i64 i2 = ip[Ai[pp]];
      if (i2 >= r1 && i2 < rr2) Si.push_back(i2 - r1);
    }
    std::sort(Si.begin() + start, Si.end());   // permute() sorts columns
    Sp[jj + 1] = (i64)Si.size();
  }
  std::vector<i64> ps_(std::max<i64>(nc, 1)), rs_(nc + 1);
  i64 nb1 = ts_scc_core(nc, Sp.data(), Si.data(), ps_.data(),
                        rs_.data());
  // --- combine coarse and fine -----------------------------------------
  std::vector<i64> tmp(std::max<i64>(nc, 1));
  for (i64 jj = 0; jj < nc; jj++) tmp[jj] = q[c2 + ps_[jj]];
  for (i64 jj = 0; jj < nc; jj++) q[c2 + jj] = tmp[jj];
  for (i64 jj = 0; jj < nc; jj++) tmp[jj] = p[r1 + ps_[jj]];
  for (i64 jj = 0; jj < nc; jj++) p[r1 + jj] = tmp[jj];
  i64 nb2 = 0;
  r[0] = s[0] = 0;
  if (cc[2] > 0) nb2++;               // leading block A(R1, [C0 C1])
  for (i64 k = 0; k < nb1; k++) {     // fine blocks of A(R2, C2)
    r[nb2] = rs_[k] + r1;
    s[nb2] = rs_[k] + c2;
    nb2++;
  }
  if (rr2 < m) {                      // trailing block A([R3 R0], C3)
    r[nb2] = rr2;
    s[nb2] = cc[3];
    nb2++;
  }
  r[nb2] = m;
  s[nb2] = n;
  return nb2;
}

// EDF greedy assignment of units to steps (superscan planner): units
// arrive sorted by deadline; each is placed at the earliest non-full
// step >= its release ("next free step" union-find with path
// compression).  On infeasibility the capacity U grows by 25% and the
// pass restarts.  Returns the final U; step_out[i] = assigned step.
// Twin of the Python fallback in superscan.plan_superscan.
i64 ts_edf(i64 nu, i64 steps, const i64 *rel, const i64 *dl, i64 U0,
           i64 *step_out) {
  std::vector<i64> nxt(steps + 1);
  std::vector<i64> fill(steps);
  i64 U = U0 < 1 ? 1 : U0;
  for (;;) {
    for (i64 t = 0; t <= steps; t++) nxt[t] = t;
    std::fill(fill.begin(), fill.end(), (i64)0);
    bool ok = true;
    for (i64 i = 0; i < nu; i++) {
      i64 t = rel[i];
      i64 root = t;
      while (nxt[root] != root) root = nxt[root];
      while (nxt[t] != root) {
        i64 nx = nxt[t];
        nxt[t] = root;
        t = nx;
      }
      t = root;
      if (t > dl[i]) {
        ok = false;
        break;
      }
      step_out[i] = t;
      if (++fill[t] == U) nxt[t] = t + 1;
    }
    if (ok) return U;
    U += U > 4 ? U / 4 : 1;
  }
}

}  // extern "C"
