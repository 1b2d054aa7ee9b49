"""Pallas fused P2C kernel: interpret-mode equality with the jacfwd path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import slam_plus_plus_tpu.models  # noqa: F401
from slam_plus_plus_tpu.assembly.assembler import Assembler
from slam_plus_plus_tpu.config import SolverConfig
from slam_plus_plus_tpu.io import datasets as D
from slam_plus_plus_tpu.io.parser import parse_g2o


def test_pallas_assemble_matches_jacfwd(tmp_path):
    cams, pts, obs = D.make_ba_scene(n_cams=6, n_points=60, seed=80)
    p = str(tmp_path / "pk.txt")
    D.write_g2o_ba(p, cams, pts, obs)
    system = parse_g2o(p)

    cfg_off = SolverConfig(dtype=jnp.float32, use_pallas="off")
    cfg_on = SolverConfig(dtype=jnp.float32, use_pallas="on")
    a_ref = Assembler(system, cfg_off)
    a_pl = Assembler(system, cfg_on)
    assert a_pl._pallas_plans == ("edge_p2c",)

    st = a_ref.snapshot_states(system)
    b_ref = a_ref.assemble(st)
    b_pl = a_pl.assemble(st)
    for name in ("pp_blocks", "pl_blocks", "ll_blocks", "eta_p", "eta_l"):
        a = np.asarray(getattr(b_ref, name))
        b = np.asarray(getattr(b_pl, name))
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() < 1e-4 * scale, name
    assert abs(float(b_ref.chi2) - float(b_pl.chi2)) < 1e-4 * float(b_ref.chi2)
    assert abs(float(b_ref.max_hdiag) - float(b_pl.max_hdiag)) < \
        1e-4 * float(b_ref.max_hdiag)


def test_panel_kernel_matches_einsum(tmp_path, monkeypatch):
    """The masked-broadcast Pallas panel builder (interpret mode) must
    reproduce the one-hot einsum panels exactly (f32)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import slam_plus_plus_tpu.models
    from slam_plus_plus_tpu.io import datasets as D
    from slam_plus_plus_tpu.io.parser import parse_g2o
    from slam_plus_plus_tpu.assembly.assembler import Assembler
    from slam_plus_plus_tpu.config import SolverConfig
    from slam_plus_plus_tpu.linalg.schur import SchurSolver
    import dataclasses

    cams, pts, obs = D.make_ba_scene(n_cams=10, n_points=300, seed=5)
    p = str(tmp_path / "pk.txt")
    D.write_g2o_ba(p, cams, pts, obs)
    s = parse_g2o(p)
    asm = Assembler(s, dataclasses.replace(SolverConfig(), dtype="float32"))
    states = asm.snapshot_states(s)
    bs = asm.assemble(states)
    sch = SchurSolver(asm)
    assert sch.panel_mode == "uniform"

    monkeypatch.setenv("SLAMPP_PALLAS_PANELS", "0")
    c_inv0, Ut0, Wt0 = sch._uniform_panels(bs)
    monkeypatch.setenv("SLAMPP_PALLAS_PANELS", "1")
    c_inv1, Ut1, Wt1 = sch._uniform_panels(bs)
    assert np.allclose(np.asarray(Ut0), np.asarray(Ut1), atol=1e-6), \
        np.abs(np.asarray(Ut0) - np.asarray(Ut1)).max()
    # a landmark observed by too few cameras has a singular pivot before
    # damping -> identical NaN pattern in both paths (equal_nan)
    assert np.allclose(np.asarray(Wt0), np.asarray(Wt1), atol=1e-4,
                       equal_nan=True)
