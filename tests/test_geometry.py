"""Geometry-module tests: P3P, essential, homography, triangulation,
distortion — synthetic ground-truth recovery."""

import numpy as np
import pytest

from slam_plus_plus_tpu.geometry import distortion, minimal, triangulate


def _rand_pose(rng):
    aa = rng.normal(0, 0.5, 3)
    th = np.linalg.norm(aa)
    k = aa / max(th, 1e-12)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    t = rng.normal(0, 1.0, 3) + np.array([0, 0, 4.0])
    return R, t


def test_p3p_recovers_pose():
    rng = np.random.default_rng(7)
    hits = 0
    for trial in range(20):
        R, t = _rand_pose(rng)
        pts = rng.uniform(-2, 2, (3, 3))
        pc = pts @ R.T + t
        if (pc[:, 2] <= 0.3).any():
            continue
        bearings = pc / np.linalg.norm(pc, axis=1, keepdims=True)
        sols = minimal.p3p(bearings, pts)
        best = min((np.abs(Rs - R).max() + np.abs(ts - t).max()
                    for Rs, ts in sols), default=np.inf)
        if best < 1e-6:
            hits += 1
    assert hits >= 12  # P3P has up to 4 solutions; GT must be among them


def test_essential_and_decomposition():
    rng = np.random.default_rng(8)
    R, t = _rand_pose(rng)
    t = t / np.linalg.norm(t)  # scale-free
    pts = rng.uniform(-2, 2, (30, 3)) + np.array([0, 0, 6.0])
    x1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ R.T + t
    x2 = pc2[:, :2] / pc2[:, 2:3]
    E = minimal.essential_8pt(x1, x2)
    # epipolar constraint
    for i in range(len(x1)):
        a = np.array([x2[i, 0], x2[i, 1], 1.0])
        b = np.array([x1[i, 0], x1[i, 1], 1.0])
        assert abs(a @ E @ b) < 1e-8
    R2, t2 = minimal.decompose_essential(E, x1, x2)
    assert np.abs(R2 - R).max() < 1e-6
    assert min(np.abs(t2 - t).max(), np.abs(t2 + t).max()) < 1e-6


def test_homography():
    rng = np.random.default_rng(9)
    H_gt = np.array([[1.1, 0.02, 0.3], [-0.03, 0.95, -0.2], [0.001, 0.002, 1.0]])
    x1 = rng.uniform(-1, 1, (12, 2))
    ones = np.ones((12, 1))
    x2h = np.concatenate([x1, ones], axis=1) @ H_gt.T
    x2 = x2h[:, :2] / x2h[:, 2:3]
    H = minimal.homography_dlt(x1, x2)
    assert np.abs(H - H_gt).max() < 1e-8


def test_triangulation():
    rng = np.random.default_rng(10)
    R, t = _rand_pose(rng)
    pts = rng.uniform(-2, 2, (15, 3)) + np.array([0, 0, 6.0])
    x1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ R.T + t
    x2 = pc2[:, :2] / pc2[:, 2:3]
    X = triangulate.triangulate_two_view(np.eye(3), np.zeros(3), R, t, x1, x2)
    assert np.abs(X - pts).max() < 1e-8
    Xn = triangulate.triangulate_nview([np.eye(3), R], [np.zeros(3), t],
                                       [x1[0], x2[0]])
    assert np.abs(Xn - pts[0]).max() < 1e-8


def test_distortion_roundtrip():
    # k = d_scaled / mean_focal must keep k*r^2 moderate in pixel space for
    # the fixed-point inverse to converge (realistic datasets have tiny d)
    intr = np.array([500.0, 510.0, 320.0, 240.0, 1.0e-6 * 505.0])
    rng = np.random.default_rng(11)
    uv = rng.uniform(0, 1, (50, 2)) * np.array([640, 480])
    # moderate distortion: roundtrip must invert
    d = distortion.distort(uv, intr)
    u = distortion.undistort(d, intr, iters=20)
    assert np.abs(u - uv).max() < 1e-6


def test_five_point_essential():
    """Minimal 5-point solver: the true E must be among the (up to 10)
    solutions for random geometry (reference CFivePoint_EssentialSolver_
    Grobner, include/geometry/TwoView.h:44-125)."""
    from slam_plus_plus_tpu.geometry.minimal import (decompose_essential,
                                                     essential_5pt)
    rng = np.random.default_rng(3)
    for _ in range(5):
        aa = rng.normal(0, 0.3, 3)
        th = np.linalg.norm(aa)
        k = aa / (th + 1e-12)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        t = rng.normal(0, 1, 3)
        t /= np.linalg.norm(t)
        X = rng.uniform(-1, 1, (5, 3))
        X[:, 2] = rng.uniform(2, 6, 5)
        x1 = X[:, :2] / X[:, 2:3]
        X2 = X @ R.T + t
        x2 = X2[:, :2] / X2[:, 2:3]
        Es = essential_5pt(x1, x2)
        assert Es, "no real solutions"
        Tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]])
        E_true = Tx @ R
        E_true /= np.linalg.norm(E_true)
        best = min(min(np.abs(E - E_true).max(), np.abs(E + E_true).max())
                   for E in Es)
        assert best < 1e-6, best
        # decomposition recovers (R, t) up to scale from the best E
        Eb = min(Es, key=lambda E: min(np.abs(E - E_true).max(),
                                       np.abs(E + E_true).max()))
        Rd, td = decompose_essential(Eb, x1, x2)
        assert np.abs(Rd - R).max() < 1e-6
        assert np.abs(td / np.linalg.norm(td) - t).max() < 1e-6


def test_polynomial_roots():
    """Closed-form quadratic/cubic/quartic solvers vs numpy companion
    roots (reference PolySolve.h CQuadraticEq/CCubicEq/CQuarticEq)."""
    import numpy as np
    from slam_plus_plus_tpu.geometry.polynomial import (
        quadratic_roots, cubic_roots, quartic_roots, polish_roots,
        roots_companion, polyfit_robust)

    rng = np.random.default_rng(3)
    # quadratics (batched)
    a, b, c = rng.normal(size=(3, 64))
    r, n = quadratic_roots(a, b, c)
    r, n = np.asarray(r), np.asarray(n)
    for i in range(64):
        exact = np.sort(np.real(
            [z for z in np.roots([a[i], b[i], c[i]]) if abs(z.imag) < 1e-9]))
        got = np.sort(r[i][np.isfinite(r[i])])
        assert len(got) == len(exact) == n[i]
        if len(exact):
            assert np.allclose(got, exact, atol=1e-6)

    # cubics: always >= 1 real root
    co = rng.normal(size=(4, 64))
    co[0] += np.sign(co[0]) * 0.5  # keep leading coeff away from 0
    r, n = cubic_roots(*co)
    r = np.asarray(polish_roots(np.stack(co, axis=-1), r))
    for i in range(64):
        exact = np.sort(np.real([z for z in np.roots(co[:, i])
                                 if abs(z.imag) < 1e-7]))
        got = np.sort(r[i][np.isfinite(r[i])])
        assert len(got) >= 1
        # every returned root must be a true root
        val = np.polyval(co[:, i], got)
        assert np.all(np.abs(val) < 1e-5 * max(1, np.abs(co[:, i]).max()))

    # quartics built from known real roots
    for i in range(32):
        roots_true = np.sort(rng.normal(size=4) * 2)
        co4 = np.poly(roots_true)
        r, n = quartic_roots(*co4)
        r = np.asarray(polish_roots(co4, r))
        got = np.sort(r[np.isfinite(r)])
        assert len(got) == 4, (i, got, roots_true)
        assert np.allclose(got, roots_true, atol=1e-5), (got, roots_true)

    # companion fallback
    z = roots_companion([1.0, 0, 0, 0, 0, -32.0])  # x^5 = 32
    assert np.min(np.abs(z - 2.0)) < 1e-9

    # robust polynomial fit: outliers suppressed by IRLS
    x = np.linspace(-2, 2, 200)
    y = 0.5 * x**3 - x + 2 + rng.normal(0, 0.01, 200)
    y[::20] += 50.0  # gross outliers
    chat = np.asarray(polyfit_robust(x, y, 3, loss="huber", scale=0.1))
    assert np.allclose(chat, [0.5, 0.0, -1.0, 2.0], atol=0.05)
    cls = np.asarray(polyfit_robust(x, y, 3))   # plain LS is polluted
    assert abs(cls[3] - 2.0) > 0.3


def test_struct_average():
    """Rigid structure averaging (reference StructAverage.h): noisy rotated
    observations of a structure average back to the centered original."""
    import numpy as np
    from slam_plus_plus_tpu.geometry.struct_average import (
        average_structure_np)
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 3))
    base -= base.mean(axis=0)
    flat = []
    for k in range(6):
        R = Rotation.random(random_state=k).as_matrix()
        t = rng.normal(size=3) * 5
        flat.append(base @ R.T + t + rng.normal(0, 0.01, (40, 3)))
    flat = np.concatenate(flat)
    avg = average_structure_np(flat, 40)
    # the average is in observation-0's frame, centered
    R0 = Rotation.random(random_state=0).as_matrix()
    expect = base @ R0.T
    expect -= expect.mean(axis=0)
    assert np.abs(avg - expect).max() < 0.02
