"""Host-side sparse solver backend (scipy).

Fills the role of the reference's CSparse/CXSparse/CHOLMOD elementwise
backends (reference include/slam/LinearSolver_CSparse.h:49 etc.): a trusted
verification oracle and a CPU fallback while the device partitioned
nested-Schur Cholesky (linalg/block_cholesky.py) handles the performance
path.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from slam_plus_plus_tpu.linalg.bsr import partitioned_to_scipy


class HostSparseSolver:
    """splu-based SPD solve with symbolic reuse across iterations.

    Reference analogue: CLinearSolver_UberBlock keeps the symbolic
    factorization (fill-reducing ordering + etree) across calls
    (reference include/slam/LinearSolver_UberBlock.h:272).  SuperLU does not
    expose numeric-only refactorization, so the reusable symbolic artifact
    here is the fill-reducing column ordering: computed once per sparsity
    pattern (COLAMD, via the first splu call), then re-applied as an explicit
    pre-permutation with ``permc_spec="NATURAL"`` on later factorizations of
    the same pattern.
    """

    def __init__(self):
        self._pattern_key = None
        self._perm_c = None

    def _factor(self, A: sp.csc_matrix):
        key = (A.shape[0], A.nnz, hash(A.indices.tobytes()),
               hash(A.indptr.tobytes()))
        if self._pattern_key != key:
            lu = spla.splu(A)
            self._perm_c = lu.perm_c
            self._pattern_key = key
            return lu, None
        # same pattern: reuse the cached fill-reducing ordering
        perm = self._perm_c
        lu = spla.splu(A[:, perm].tocsc(), permc_spec="NATURAL")
        return lu, perm

    def _solve_csc(self, A: sp.csc_matrix, rhs: np.ndarray) -> np.ndarray:
        lu, perm = self._factor(A)
        x = lu.solve(rhs)
        if perm is not None:
            out = np.empty_like(x)
            out[perm] = x
            return out
        return x

    def solve_partitioned(self, asm, system):
        """Solve the full [[Hpp,Hpl],[Hpl^T,Hll]] system on host.

        Returns (dx_p [Np, Bp], dx_l [Nl, Bl]) as numpy arrays.
        """
        Np, Bp, Nl, Bl = asm.Np, asm.Bp, asm.Nl, asm.Bl
        A = partitioned_to_scipy(
            asm.pp_rows, asm.pp_cols, np.asarray(system.pp_blocks), Np, Bp,
            asm.pl_rows if Nl else None, asm.pl_cols if Nl else None,
            np.asarray(system.pl_blocks) if Nl else None,
            np.asarray(system.ll_blocks) if Nl else None, Nl, Bl)
        rhs = np.concatenate([np.asarray(system.eta_p).ravel()[:Np * Bp],
                              np.asarray(system.eta_l).ravel()[:Nl * Bl]])
        x = self._solve_csc(A.tocsc(), rhs)
        dx_p = x[:Np * Bp].reshape(Np, Bp)
        dx_l = (x[Np * Bp:].reshape(Nl, Bl) if Nl else
                np.zeros((max(Nl, 1), Bl)))
        return dx_p, dx_l

    def solve_blocks(self, rows, cols, blocks, rhs, Np, Bp):
        """Solve a single uniform block-sparse SPD system (upper pairs)."""
        A = partitioned_to_scipy(rows, cols, np.asarray(blocks), Np, Bp)
        return self._solve_csc(A.tocsc(),
                               np.asarray(rhs).ravel()).reshape(Np, Bp)
