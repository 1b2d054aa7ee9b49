"""FastL incremental solver: golden parity with the reference binary.

Goldens below were produced by the reference SLAM++ build
(.refbuild/bin/slam_plus_plus -i <file> -po -nb -fL -nsp 1) on the
deterministic synthetic datasets regenerated here from fixed seeds:

  manhattan 300 seed 91:             chi2 46.20,  8 iterations, 0 pushes
  manhattan 1500 seed 92 lp 0.35:    chi2 616.94, 206 iterations
  landmark 500/120 seed 11 (-fL):    chi2 17.38, 499 iterations, 1 push

(verified 2026-08-19; reference prints integer-rounded chi2 at 2 decimals,
matching the unit_tests.sh comparison style, scripts/tests/unit_tests.sh:325)
"""

import numpy as np
import pytest

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.io.parser import parse_g2o
from slam_plus_plus_tpu.solvers.fastl import FastLSolver


def _run(tmp_path, n, seed, refresh, **kw):
    poses, edges = D.make_manhattan_2d(n_poses=n, seed=seed, **kw)
    p = str(tmp_path / f"m{n}.txt")
    D.write_g2o_2d(p, edges, poses)
    s = parse_g2o(p)
    inc = FastLSolver(s, every_n=1, refresh=refresh)
    return inc.run() + (inc,)


@pytest.mark.parametrize("refresh", ["full", "dirty"])
def test_fastl_golden_small(tmp_path, refresh):
    chi2, iters, inc = _run(tmp_path, 300, 91, refresh)
    assert iters == 8
    assert chi2 == pytest.approx(46.20, abs=0.01)
    assert inc.stats["pushes"] == 0


@pytest.mark.parametrize("refresh", ["full", "dirty"])
def test_fastl_golden_with_pushes(tmp_path, refresh):
    chi2, iters, inc = _run(tmp_path, 1500, 92, refresh, loop_prob=0.35)
    assert iters == 206
    assert chi2 == pytest.approx(616.94, abs=0.01)
    assert inc.stats["pushes"] == 11


@pytest.mark.parametrize("refresh", ["full", "dirty"])
def test_fastl_golden_landmarks(tmp_path, refresh):
    """Landmark problems route through the mixed-class MIS engine
    (landmarks padded to Bp, eliminated by the independent-set levels);
    golden matches the reference fastL run on the identical file."""
    gp, gl, pe, le = D.make_landmark_2d(n_poses=500, n_landmarks=120,
                                        world=28.0, obs_radius=6.0, seed=11)
    p = str(tmp_path / "lm.txt")
    D.write_g2o_landmark_2d(p, pe, le)
    inc = FastLSolver(parse_g2o(p), every_n=1, refresh=refresh)
    chi2, iters = inc.run()
    assert iters == 499
    assert chi2 == pytest.approx(17.38, abs=0.01)
    assert inc.stats["pushes"] == 1


def test_fastl_inloop_marginals(tmp_path):
    """Marginals maintained INSIDE the incremental loop (reference
    NonlinearSolver_Lambda.h:670-705 + Marginals.h:5224): omega-only solve
    points get the exact Woodbury diag update through the maintained
    factor, pushes trigger the recurrent recompute, and every updated
    Sigma must match a fresh recurrent recovery from the same stores
    (which itself is checked against the dense lambda^-1 oracle)."""
    import dataclasses
    import jax.numpy as jnp
    from slam_plus_plus_tpu.config import SolverConfig, MarginalsPolicy

    poses, edges = D.make_manhattan_2d(n_poses=300, seed=92, loop_prob=0.3)
    p = str(tmp_path / "mm.txt")
    D.write_g2o_2d(p, edges, poses)
    s = parse_g2o(p)
    cfg = SolverConfig(marginals=MarginalsPolicy(enabled=True))
    inc = FastLSolver(s, every_n=1, config=cfg)

    checked = {"n": 0, "worst": 0.0}
    orig_update = inc._sigma_update

    def checking_update(stores, G, D_):
        out = orig_update(stores, G, D_)
        ref = inc._last_check_ref = np.asarray(
            inc.chol.marginals_from_stores(stores, inc.inc)[
                np.asarray(inc.chol.plan.diag_pos0)])
        got = np.asarray(out)
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-12)
        checked["n"] += 1
        checked["worst"] = max(checked["worst"], err)
        return out

    inc._sigma_update = checking_update
    chi2, iters = inc.run()

    assert "update" in inc.marginals_trace
    assert "recalculate" in inc.marginals_trace
    assert checked["n"] >= 5
    assert checked["worst"] < 1e-6, checked

    # oracle: the recurrent recovery itself vs the dense lambda^-1 built
    # from the SAME maintained level-0 blocks
    K0 = (int(inc.inc.off_H[1]) if inc.chol.plan.levels
          else inc.inc.off_H_bottom + inc.inc.KB)
    # _sigma_diag is valid for the stores at the last in-loop refresh; use
    # a fresh recompute against the final stores for the oracle comparison
    stores = None  # stores are internal to run(); rebuild from system state
    from slam_plus_plus_tpu.assembly.assembler import Assembler
    asm = inc.asm
    states = asm.snapshot_states(inc.system)
    counts = {n_: st.n for n_, st in inc.system.edge_stores.items()}
    nact = sum(inc.system.vertex_stores[t].n
               for t in inc.system.vertex_stores)
    stores2, _eta = inc._init_stores(states, counts, nact)
    Sig = np.asarray(inc.chol.marginals_from_stores(stores2, inc.inc))
    diag = Sig[np.asarray(inc.chol.plan.diag_pos0)]

    from slam_plus_plus_tpu.linalg.dense import scatter_dense
    bs = asm.assemble_active(states, counts, nact, 0)
    A = np.asarray(scatter_dense(asm.pp_rows, asm.pp_cols, bs.pp_blocks,
                                 asm.Np, asm.Bp))
    Sig_oracle = np.linalg.inv(A)
    Np, Bp = asm.Np, asm.Bp
    for v in range(0, Np, 37):
        blk = Sig_oracle[v * Bp:(v + 1) * Bp, v * Bp:(v + 1) * Bp]
        got = diag[v].reshape(Bp, Bp)
        assert np.allclose(got, blk, rtol=1e-6, atol=1e-9 * abs(blk).max() +
                           1e-12), v


def _check_batch_vs_serial(sv):
    import numpy as np
    keys = sorted(sv._sched)
    assert len(keys) > 20
    batch = sv._prepared_all
    for si in keys:
        serial = sv.inc.prepare_host(sv._sched[si])
        b = batch[si]
        if serial is None:
            assert b is None
            continue
        seg_s, buf_s, bots_s, both_s = serial
        seg_b, buf_b, bots_b, both_b = b
        assert np.array_equal(seg_s, seg_b), si
        assert np.array_equal(buf_s, buf_b), si
        assert np.array_equal(bots_s, bots_b), si
        assert np.array_equal(both_s, both_b), si


def test_prepare_host_batch_matches_serial():
    """The vectorized whole-replay walk must be bit-equal to the per-point
    prepare_host (same seg/buf/bot arrays, same overflow decisions) — on a
    pose graph AND on a landmark replay with capacity-overflow solve points
    (an overflowed solve's scatter once spilled into its NEIGHBOR's packed
    buffer: reference-exact 49.65 became 12016 on lm800)."""
    import os, tempfile
    from slam_plus_plus_tpu.io import datasets as D
    from slam_plus_plus_tpu.io.parser import parse_g2o
    from slam_plus_plus_tpu.solvers.fastl import FastLSolver
    os.environ["SLAMPP_NATIVE"] = "0"
    try:
        d = tempfile.mkdtemp()
        poses, edges = D.make_manhattan_2d(n_poses=600, seed=3,
                                           loop_prob=0.3)
        p = os.path.join(d, "m600.txt")
        D.write_g2o_2d(p, edges, poses)
        _check_batch_vs_serial(FastLSolver(parse_g2o(p), every_n=1))
        gp, gl, pe, le = D.make_landmark_2d(n_poses=800, n_landmarks=100,
                                            world=30.0, obs_radius=8.0,
                                            seed=7)
        p2 = os.path.join(d, "lm800.txt")
        D.write_g2o_landmark_2d(p2, pe, le)
        sv = FastLSolver(parse_g2o(p2), every_n=1)
        assert any(v is None for v in sv._prepared_all.values()), \
            "dataset must exercise the overflow path"
        _check_batch_vs_serial(sv)
    finally:
        os.environ.pop("SLAMPP_NATIVE", None)


def test_native_engine_matches_reference_trajectory():
    """The native C++ replay engine must reproduce the jax engine (and the
    reference binary) exactly on pose-graph and landmark replays."""
    import os, tempfile
    import numpy as np
    from slam_plus_plus_tpu.io import datasets as D
    from slam_plus_plus_tpu.io.parser import parse_g2o
    from slam_plus_plus_tpu.solvers.fastl import FastLSolver
    from slam_plus_plus_tpu.solvers.native_engine import NativeReplay
    d = tempfile.mkdtemp()
    cases = []
    poses, edges = D.make_manhattan_2d(n_poses=600, seed=3, loop_prob=0.3)
    p = os.path.join(d, "m600.txt")
    D.write_g2o_2d(p, edges, poses)
    cases.append(p)
    gp, gl, pe, le = D.make_landmark_2d(n_poses=500, n_landmarks=80,
                                        world=25.0, obs_radius=8.0, seed=9)
    p2 = os.path.join(d, "lm500.txt")
    D.write_g2o_landmark_2d(p2, pe, le)
    cases.append(p2)
    for path in cases:
        os.environ["SLAMPP_NATIVE"] = "0"
        sj = FastLSolver(parse_g2o(path), every_n=1)
        cj, ij = sj.run()
        os.environ.pop("SLAMPP_NATIVE", None)
        sn = FastLSolver(parse_g2o(path), every_n=1)
        assert sn._native is not None
        cn, i_n = sn.run()
        assert i_n == ij, (path, i_n, ij)
        assert abs(cn - cj) <= 1e-6 * max(abs(cj), 1.0), (path, cn, cj)
        # and lambda-mode (onetime_dx=False) agreement
        os.environ["SLAMPP_NATIVE"] = "0"
        sjl = FastLSolver(parse_g2o(path), every_n=1, onetime_dx=False)
        cjl, ijl = sjl.run()
        os.environ.pop("SLAMPP_NATIVE", None)
        snl = FastLSolver(parse_g2o(path), every_n=1, onetime_dx=False)
        cnl, inl = snl.run()
        assert inl == ijl and abs(cnl - cjl) <= 1e-6 * max(abs(cjl), 1.0)


def test_full_scan_matches_unrolled():
    """The bucketed-scan full redescent must reproduce the round-4
    unrolled redescent (same stores, same solve)."""
    import numpy as np
    import jax.numpy as jnp
    from slam_plus_plus_tpu.io import datasets as D
    from slam_plus_plus_tpu.io.parser import parse_g2o
    from slam_plus_plus_tpu.solvers.fastl import FastLSolver
    import tempfile, os, jax
    poses, edges = D.make_manhattan_2d(n_poses=500, seed=12, loop_prob=0.3)
    p = os.path.join(tempfile.mkdtemp(), "m500.txt")
    D.write_g2o_2d(p, edges, poses)
    os.environ["SLAMPP_NATIVE"] = "0"   # exercise the jax engine
    try:
        sv = FastLSolver(parse_g2o(p), every_n=1)
    finally:
        os.environ.pop("SLAMPP_NATIVE", None)
    asm = sv.asm
    states = asm.snapshot_states(sv.system)
    counts = {n: sv.system.edge_stores[n].n for n in asm.edge_data}
    bs = asm.assemble_active(states, counts, len(sv.system.vertex_order), 0)
    H0 = bs.pp_blocks[sv.chol.plan.input_perm]
    new = sv.inc._full_impl(H0)
    old = jax.jit(sv.inc._full_impl_unrolled)(H0)
    for k in ("H", "C", "W", "P", "dense", "L", "s", "sv", "outer0"):
        a, b = np.asarray(new[k]), np.asarray(old[k])
        if k in ("C", "W", "P", "H"):
            a, b = a[:-1], b[:-1]   # sink rows differ (scratch)
            if k == "C":
                a, b = a[:-1], b[:-1]  # dummy stays zero in both
        err = np.abs(a - b).max() if a.size else 0.0
        scale = max(np.abs(b).max(), 1e-30)
        assert err <= 1e-9 * scale, (k, err, scale)
    # and the solve through the new stores matches
    eta0 = bs.eta_p
    dx_new = sv.inc.solve(dict(new), eta0)
    dx_old = sv.inc.solve(dict(old), eta0)
    assert np.allclose(np.asarray(dx_new), np.asarray(dx_old), atol=1e-8)
