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
