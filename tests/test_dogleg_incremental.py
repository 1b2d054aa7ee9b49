"""Incremental Lambda-DL: fluid relinearization + maintained Schur complement.

The fluid update is EXACT (moved-vertex gating, reference
NonlinearSolver_Lambda_DL.h:1417,1990), so the maintained lambda pieces and
the dense SC must bitwise-track a fresh assembly at the same states — that
is the primary invariant tested here, after a full marker replay with
pushes, activations, and landmark re-eliminations.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.app.incremental_ba import (parse_with_markers,
                                                   write_incremental_ba)
from slam_plus_plus_tpu.solvers.dogleg_incremental import (
    IncrementalDoglegSolver)


@pytest.fixture(scope="module")
def replayed(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dl") / "iba.txt")
    cams, pts, obs = D.make_ba_scene(n_cams=12, n_points=300, seed=5)
    write_incremental_ba(path, cams, pts, obs, cams_per_chunk=3)
    system, markers = parse_with_markers(path)
    s = IncrementalDoglegSolver(system)
    final, trace = s.run([m - 1 for m in markers])
    return s, final, trace


def test_maintained_state_exact(replayed):
    """Maintained lambda pieces + SC == fresh assembly at the same states."""
    s, _final, _trace = replayed
    asm = s.asm
    bs = asm.assemble_active(s._states, s._counts, s._nap, s._nal)
    for name, mine, ref in [("pp", s._M["pp"], bs.pp_blocks),
                            ("u", s._M["u"], bs.pl_blocks),
                            ("ll", s._M["ll"], bs.ll_blocks),
                            ("eta_p", s._M["eta_p"], bs.eta_p),
                            ("eta_l", s._M["eta_l"], bs.eta_l)]:
        scale = float(jnp.max(jnp.abs(ref))) + 1e-30
        err = float(jnp.max(jnp.abs(mine - ref))) / scale
        # delta accumulation rounds off slightly (differences of large
        # contributions); 1e-7 still rules out any structural drift
        assert err < 1e-7, (name, err)
    sc_fresh = s._build_sc_jit(bs, jnp.asarray(s._alpha_l,
                                               dtype=asm.dtype))
    err = (float(jnp.max(jnp.abs(s._M["sc"] - sc_fresh))) /
           (float(jnp.max(jnp.abs(sc_fresh))) + 1e-30))
    assert err < 1e-7, err


def test_converges_to_batch_quality(replayed):
    """The incremental replay's final chi2 is within 5% of a batch dogleg
    run on the full problem (the acceptance bound used everywhere)."""
    s, final, trace = replayed
    from slam_plus_plus_tpu.solvers.dogleg import DoglegSolver
    batch = DoglegSolver(s.system)
    chi2_b, _ = batch.optimize(20, 1e-3)
    assert final <= max(chi2_b, 1e-3) * 1.05


def test_fluid_savings(replayed):
    """Fluid relinearization must refresh fewer edge evaluations than
    full relinearization every iteration would."""
    s, _final, _trace = replayed
    total_edges = sum(p.E for p in s.asm.plans)
    assert s.stats["refreshed_edges"] < s.stats["iters"] * total_edges


def test_marginals_match_batch(replayed):
    """Schur-domain marginals from the MAINTAINED state match the batch
    BA marginals on a fresh assembly."""
    s, _final, _trace = replayed
    asm = s.asm
    from slam_plus_plus_tpu.marginals import Marginals
    bs = asm.assemble_active(s._states, s._counts, s._nap, s._nal)
    # identical gauge damping on both sides (the BA gauge direction makes
    # the covariance ~1/alpha sensitive along it)
    alpha = float(bs.max_hdiag) * 1e-10
    p_diag, l_diag = s.marginals(alpha=alpha)
    ref = Marginals(asm, gauge_jitter=1e-10).compute(bs)
    # both invert a gauge-jittered SC; agreement is to jitter accuracy
    pd_err = (float(jnp.max(jnp.abs(p_diag - ref.p_diag))) /
              (float(jnp.max(jnp.abs(ref.p_diag))) + 1e-30))
    ld_err = (float(jnp.max(jnp.abs(l_diag - ref.l_diag))) /
              (float(jnp.max(jnp.abs(ref.l_diag))) + 1e-30))
    assert pd_err < 1e-6, pd_err
    assert ld_err < 1e-6, ld_err
