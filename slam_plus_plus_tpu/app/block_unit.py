"""Built-in block-matrix unit tests (-rmut) and benchmarks (-rmb).

Reference analogue: CBlockMatrixUnitTests::RunAll behind the -rmut flag
(reference include/slam_app/BlockUnit.h:59-120, src/slam_app/BlockUnit.cpp)
— decomposition, multiplication, and addition tests over randomly
structured block matrices — and CBlockMatrixBenchmark behind -rmb
(reference include/slam_app/BlockBench.h:122,2224).  The UF-collection
matrix files the reference benchmarks against are not fetchable here;
the benchmark generates deterministic synthetic block systems at several
scales instead and reports the same families of timings (structure
construction, factorization, products).
"""

from __future__ import annotations

import time

import numpy as np


def _random_spd_pattern(rng, n, extra_pairs, B):
    """Random connected SPD block pattern + planar values (numpy)."""
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    if n > 1:
        rows.append(np.arange(n - 1))
        cols.append(np.arange(1, n))
    for _ in range(extra_pairs):
        a, b = rng.integers(0, n, 2)
        if a == b:
            continue
        rows.append(np.array([min(a, b)]))
        cols.append(np.array([max(a, b)]))
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    keys = rows * n + cols
    keys = np.unique(keys)
    rows, cols = keys // n, keys % n

    K = len(rows)
    blocks = rng.normal(size=(K, B, B))
    diag = rows == cols
    # SPD: symmetric diagonal blocks + dominance
    blocks[diag] = blocks[diag] + np.transpose(blocks[diag], (0, 2, 1))
    deg = np.bincount(rows, minlength=n) + np.bincount(cols, minlength=n)
    for i in np.flatnonzero(diag):
        blocks[i] += np.eye(B) * (B * (deg[rows[i]] + 2))
    return rows, cols, blocks.reshape(K, B * B)


def _dense_of(rows, cols, blocks, n, B):
    A = np.zeros((n * B, n * B))
    for k in range(len(rows)):
        r, c = rows[k], cols[k]
        A[r * B:(r + 1) * B, c * B:(c + 1) * B] += blocks[k].reshape(B, B)
        if r != c:
            A[c * B:(c + 1) * B, r * B:(r + 1) * B] += \
                blocks[k].reshape(B, B).T
    return A


def run_unit_tests(verbose: bool = True) -> bool:
    """The -rmut suite.  Returns True when everything passes."""
    import jax.numpy as jnp
    from slam_plus_plus_tpu.ops import planar
    from slam_plus_plus_tpu.linalg.block_cholesky import BlockCholeskySolver

    rng = np.random.default_rng(7)
    ok = True

    def check(name, cond):
        nonlocal ok
        ok = ok and bool(cond)
        if verbose:
            print(f"  [{'PASS' if cond else 'FAIL'}] {name}")

    # --- matrix addition / elementwise (CBlockMatrixUnitTests::
    # MatrixAddition_UnitTest analogue) ------------------------------------
    for B in (2, 3, 6):
        K = 64
        a = rng.normal(size=(K, B * B))
        b = rng.normal(size=(K, B * B))
        s = np.asarray(jnp.asarray(a) + jnp.asarray(b))
        check(f"addition B={B}", np.allclose(s, a + b))

    # --- multiplication kernels (MatrixMultiplication_UnitTest) ----------
    for (Br, Bm, Bc) in ((3, 3, 3), (6, 3, 6), (2, 2, 2), (6, 6, 6)):
        K = 128
        a = rng.normal(size=(K, Br * Bm))
        b = rng.normal(size=(K, Bm * Bc))
        got = np.asarray(planar.bmm(jnp.asarray(a), jnp.asarray(b),
                                    Br, Bm, Bc))
        want = np.einsum("kij,kjl->kil", a.reshape(K, Br, Bm),
                         b.reshape(K, Bm, Bc)).reshape(K, Br * Bc)
        check(f"bmm {Br}x{Bm}x{Bc}", np.allclose(got, want, atol=1e-10))

        got = np.asarray(planar.bmm_A_Bt(jnp.asarray(a), jnp.asarray(a),
                                         Br, Bm, Br))
        want = np.einsum("kij,klj->kil", a.reshape(K, Br, Bm),
                         a.reshape(K, Br, Bm)).reshape(K, Br * Br)
        check(f"bmm_A_Bt {Br}x{Bm}", np.allclose(got, want, atol=1e-10))

    for B in (2, 3, 6):
        K = 64
        m = rng.normal(size=(K, B, B))
        spd = np.einsum("kij,klj->kil", m, m) + 3 * np.eye(B)
        got = np.asarray(planar.binv(jnp.asarray(spd.reshape(K, B * B)), B))
        want = np.linalg.inv(spd).reshape(K, B * B)
        check(f"binv B={B}", np.allclose(got, want, atol=1e-8))

    # --- decomposition (MatrixDecomposition_UnitTest analogue): the
    # MIS-Schur factorization vs a dense oracle on random SPD patterns ----
    for (n, extra, B) in ((40, 60, 3), (120, 200, 3), (60, 100, 6)):
        rows, cols, blocks = _random_spd_pattern(rng, n, extra, B)
        A = _dense_of(rows, cols, blocks, n, B)
        eta = rng.normal(size=(n, B))
        solver = BlockCholeskySolver(rows, cols, n, B, bottom=8)
        dx = np.asarray(solver.solve(jnp.asarray(blocks), jnp.asarray(eta)))
        want = np.linalg.solve(A, eta.reshape(-1)).reshape(n, B)
        rel = (np.abs(dx - want).max() /
               (np.abs(want).max() + 1e-30))
        check(f"block cholesky solve n={n} B={B} (rel {rel:.2e})",
              rel < 1e-8)

    if verbose:
        print("block matrix unit tests:", "PASS" if ok else "FAIL")
    return ok


def run_benchmarks(name: str = "synthetic", btype: str = "all",
                   verbose: bool = True) -> dict:
    """The -rmb suite: result sheet of block-op timings at several scales.

    btype: 'alloc' (structure/plan construction), 'factor', or 'all'
    (mirroring the reference's benchmark type argument,
    src/slam_app/Main.cpp:103-104)."""
    import jax
    import jax.numpy as jnp
    from slam_plus_plus_tpu.linalg.block_cholesky import BlockCholeskySolver

    rng = np.random.default_rng(11)
    sheet = {}
    for (n, extra, B) in ((500, 1000, 3), (2000, 4000, 3), (5000, 10000, 6)):
        rows, cols, blocks = _random_spd_pattern(rng, n, extra, B)
        eta = rng.normal(size=(n, B))
        row = {}
        if btype in ("alloc", "all"):
            t0 = time.perf_counter()
            solver = BlockCholeskySolver(rows, cols, n, B, bottom=64)
            row["symbolic_s"] = round(time.perf_counter() - t0, 4)
        else:
            solver = BlockCholeskySolver(rows, cols, n, B, bottom=64)
        if btype in ("factor", "all"):
            bj = jnp.asarray(blocks)
            ej = jnp.asarray(eta)
            dx = solver.solve(bj, ej)
            jax.block_until_ready(dx)      # compile
            t0 = time.perf_counter()
            N = 5
            for _ in range(N):
                dx = solver.solve(bj, ej)
            jax.block_until_ready(dx)
            row["factor_solve_ms"] = round(
                (time.perf_counter() - t0) / N * 1e3, 3)
        sheet[f"n={n} B={B} K={len(rows)}"] = row
        if verbose:
            print(f"  {name}: n={n} B={B} K={len(rows)}: {row}")
    return sheet
