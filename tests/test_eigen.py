"""Eigensolver tests: dense-exact and matrix-free LOBPCG paths."""

import numpy as np
import pytest

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.linalg.eigen import _dense_lambda, sym_eigs


def _build(n, seed, tmp_path):
    poses, edges = D.make_manhattan_2d(n_poses=n, seed=seed)
    p = str(tmp_path / "e.txt")
    D.write_g2o_2d(p, edges, poses)
    s = parse_g2o(p)
    asm = Assembler(s)
    return asm, asm.assemble(asm.snapshot_states(s))


def test_dense_path(tmp_path):
    asm, bs = _build(50, 70, tmp_path)
    w, V = sym_eigs(asm, bs, k=3, which="LM")
    ref = np.sort(np.abs(np.linalg.eigvalsh(_dense_lambda(asm, bs))))[::-1]
    assert np.allclose(np.abs(w), ref[:3], rtol=1e-10)
    # eigenpairs satisfy A v = w v
    A = _dense_lambda(asm, bs)
    for i in range(3):
        assert np.abs(A @ V[:, i] - w[i] * V[:, i]).max() < 1e-6 * abs(w[i])


def test_smallest_magnitude(tmp_path):
    asm, bs = _build(40, 71, tmp_path)
    w, V = sym_eigs(asm, bs, k=2, which="SM")
    ref = np.sort(np.abs(np.linalg.eigvalsh(_dense_lambda(asm, bs))))
    assert np.allclose(np.abs(w), ref[:2], rtol=1e-8)


def test_lobpcg_path(tmp_path):
    asm, bs = _build(800, 72, tmp_path)
    w, V = sym_eigs(asm, bs, k=3, which="LM")
    ref = np.sort(np.abs(np.linalg.eigvalsh(_dense_lambda(asm, bs))))[::-1]
    assert np.allclose(np.abs(np.asarray(w)), ref[:3], rtol=1e-4)


def test_nested_schur_analysis(tmp_path):
    from slam_plus_plus_tpu.linalg.nested_schur import nested_schur_analysis
    gp, gl, pe, le = D.make_landmark_2d(n_poses=80, n_landmarks=30, seed=73)
    p = str(tmp_path / "ns.txt")
    D.write_g2o_landmark_2d(p, pe, le)
    s = parse_g2o(p)
    asm = Assembler(s)
    report = nested_schur_analysis(asm)
    assert report[0]["kind"] == "landmarks"
    assert report[0]["eliminated"] == asm.Nl
    assert len(report) >= 2  # at least one bisection level


def test_condition_estimate_matrix_free(tmp_path):
    from slam_plus_plus_tpu.linalg.eigen import condition_estimate
    asm, bs = _build(700, 74, tmp_path)  # 2100 dims > _DENSE_LIMIT
    kappa = condition_estimate(asm, bs)
    w = np.abs(np.linalg.eigvalsh(_dense_lambda(asm, bs)))
    ref = float(w.max() / w.min())
    assert kappa == pytest.approx(ref, rel=0.05)


def test_condition_estimate_factor_path(tmp_path, monkeypatch):
    """Pose-only condition estimates apply A^-1 through the cached
    MIS-Schur factor (no inner CG); accuracy checked vs the dense oracle
    at a size where both run, scale smoke at 10k poses (30k dims)."""
    import time
    import slam_plus_plus_tpu.linalg.eigen as E

    poses, edges = D.make_manhattan_2d(n_poses=300, seed=3,
                                              loop_prob=0.3)
    p = str(tmp_path / "c.txt")
    D.write_g2o_2d(p, edges, poses)
    s = parse_g2o(p)
    asm = Assembler(s)
    bs = asm.assemble(asm.snapshot_states(s))
    kappa_dense = E.condition_estimate(asm, bs)          # dense (n <= limit)
    monkeypatch.setattr(E, "_DENSE_LIMIT", 10)
    kappa_factor = E.condition_estimate(asm, bs)         # factor path
    assert abs(kappa_factor - kappa_dense) / kappa_dense < 0.05, \
        (kappa_factor, kappa_dense)

    poses, edges = D.make_city_2d(n_poses=10000, seed=4)
    p2 = str(tmp_path / "c2.txt")
    D.write_g2o_2d(p2, edges, poses)
    s2 = parse_g2o(p2)
    asm2 = Assembler(s2)
    bs2 = asm2.assemble(asm2.snapshot_states(s2))
    t0 = time.perf_counter()
    kappa = E.condition_estimate(asm2, bs2)
    el = time.perf_counter() - t0
    assert np.isfinite(kappa) and kappa > 10.0
    assert el < 300.0, el
