"""Selected sparse inverse (Takahashi) for residual-covariance diagonals.

The largest-normalized-residual test needs diag(H G⁻¹ Hᵀ). The dense path
(baddata._projection_diag) computes G⁻¹Hᵀ with a batched solve — O(n² m),
fine to a few thousand buses. At ACTIVSg scale the reference switches to a
selected inverse on the sparse factor (badData.jl:536-911: elimination
tree, symbolic factorization, Takahashi recurrences on the CHOLMOD/LU
factors). This is the host-side equivalent on a scipy sparse Cholesky-like
factorization.

Takahashi recurrence on A = L D Lᵀ: with Z = A⁻¹,

    Z[j, j]  = 1/d_j - Σ_{k>j, L[k,j]≠0} L[k, j] Z[k, j]
    Z[i, j]  = - Σ_{k>j, L[k,j]≠0} L[k, j] Z[max(i,k), min(i,k)]   (i > j)

evaluated in reverse column order over the pattern of L — only entries on
the factor's pattern are needed to obtain every Z entry on that pattern,
including the full diagonal.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def ldl_factor(a: sp.spmatrix):
    """LDLᵀ factorization via scipy's unpivoted-friendly splu.

    Returns (L unit-lower csc, d diagonal, perm) with
    L D Lᵀ = A[ix(iperm, iperm)], iperm the inverse of ``perm`` — i.e. the
    permuted position of original index u is ``perm[u]``.
    """
    a = sp.csc_matrix(a)
    lu = sp.linalg.splu(a, permc_spec="MMD_AT_PLUS_A",
                        options={"SymmetricMode": True},
                        diag_pivot_thresh=0.0)
    # for SPD A with symmetric mode, row and column permutations agree and
    # U = D Lᵀ. scipy's convention: L U = A[ix(iperm, iperm)] with iperm
    # the inverse of perm_c — permuted position of original index u is
    # perm_c[u].
    l = sp.csc_matrix(lu.L)
    u = sp.csc_matrix(lu.U)
    d = u.diagonal()
    perm = lu.perm_c
    return l, d, perm


def takahashi_diag(a: sp.spmatrix) -> np.ndarray:
    """diag(A⁻¹) for sparse SPD A via the Takahashi selected inverse."""
    n = a.shape[0]
    l, d, perm = ldl_factor(a)
    lc = l.tocsc()
    indptr, indices, data = lc.indptr, lc.indices, lc.data

    # store Z entries on the pattern of L (plus diagonal), keyed per column
    z: list[dict] = [dict() for _ in range(n)]

    # column structures of L (below-diagonal entries)
    col_rows = [indices[indptr[j] + 1:indptr[j + 1]] for j in range(n)]
    col_vals = [data[indptr[j] + 1:indptr[j + 1]] for j in range(n)]

    def get_z(i, j):
        if i < j:
            i, j = j, i
        return z[j].get(i, 0.0)

    for j in range(n - 1, -1, -1):
        rows_j = col_rows[j]
        vals_j = col_vals[j]
        # off-diagonal entries Z[i, j] for i in pattern(L[:, j]), largest
        # first so dependencies (deeper in the tree) are ready
        for idx in range(len(rows_j) - 1, -1, -1):
            i = rows_j[idx]
            acc = 0.0
            rows_i = col_rows[j]
            vals_i = col_vals[j]
            for t in range(len(rows_i)):
                k = rows_i[t]
                acc += vals_i[t] * get_z(k, i)
            z[j][i] = -acc
        # diagonal
        acc = 0.0
        for t in range(len(rows_j)):
            acc += vals_j[t] * z[j].get(rows_j[t], 0.0)
        z[j][j] = 1.0 / d[j] - acc

    diag_p = np.array([z[j][j] for j in range(n)])
    # permuted position of original index u is perm[u]
    return diag_p[perm]


def projection_diag_sparse(h: sp.spmatrix, w: np.ndarray,
                           mask_cols=None) -> np.ndarray:
    """c = diag(H G⁻¹ Hᵀ) with G = HᵀWH, using the selected inverse.

    Needs Z entries of G⁻¹ on the sparsity of HᵀH — which the factor
    pattern covers (fill-in only adds entries). For each measurement row
    h_r: c_r = Σ_{i,j∈supp(h_r)} h_ri h_rj Z[i, j].
    """
    h = sp.csr_matrix(h)
    n = h.shape[1]
    g = (h.T.multiply(w) @ h).tocsc()
    if mask_cols is not None:
        m = np.ones(n)
        m[np.asarray(mask_cols)] = 0.0
        g = sp.diags(m) @ g @ sp.diags(m) + sp.diags(1.0 - m)
        h = h @ sp.diags(m)

    l, d, perm = ldl_factor(g)
    lc = l.tocsc()
    indptr, indices, data = lc.indptr, lc.indices, lc.data

    z: list[dict] = [dict() for _ in range(n)]
    col_rows = [indices[indptr[j] + 1:indptr[j + 1]] for j in range(n)]
    col_vals = [data[indptr[j] + 1:indptr[j + 1]] for j in range(n)]

    def get_z(i, j):
        if i < j:
            i, j = j, i
        return z[j].get(i, 0.0)

    for j in range(n - 1, -1, -1):
        rows_j = col_rows[j]
        vals_j = col_vals[j]
        for idx in range(len(rows_j) - 1, -1, -1):
            i = rows_j[idx]
            acc = 0.0
            for t in range(len(rows_j)):
                acc += vals_j[t] * get_z(rows_j[t], i)
            z[j][i] = -acc
        acc = 0.0
        for t in range(len(rows_j)):
            acc += vals_j[t] * z[j].get(rows_j[t], 0.0)
        z[j][j] = 1.0 / d[j] - acc

    # evaluate the quadratic form per measurement row (permuted space)
    hp = h.tocsr()
    out = np.zeros(hp.shape[0])
    for r in range(hp.shape[0]):
        cols = hp.indices[hp.indptr[r]:hp.indptr[r + 1]]
        vals = hp.data[hp.indptr[r]:hp.indptr[r + 1]]
        pc = perm[cols]
        acc = 0.0
        for a_i in range(len(pc)):
            for b_i in range(len(pc)):
                acc += vals[a_i] * vals[b_i] * get_z(pc[a_i], pc[b_i])
        out[r] = acc
    return out
