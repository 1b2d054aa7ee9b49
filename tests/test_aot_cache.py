"""Smoke test for the (default-off) persistent AOT export cache."""
import os

import numpy as np


def test_aot_fn_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("SLAMPP_AOT_CACHE", str(tmp_path))
    import importlib
    import slam_plus_plus_tpu.utils.aot_cache as ac
    importlib.reload(ac)

    import jax.numpy as jnp

    def f(d, y):
        return {"out": d["a"] @ y + 1.0}

    g = ac.aot_jit(f, "smoke", "salt0", enabled=True)
    d = {"a": jnp.ones((8, 8))}
    y = jnp.ones((8, 4))
    out1 = g(d, y)["out"]
    # second AotFn with the same key loads the serialized blob
    g2 = ac.aot_jit(f, "smoke", "salt0", enabled=True)
    out2 = g2(d, y)["out"]
    assert np.allclose(np.asarray(out1), np.asarray(out2))
    blobs = [p for p in os.listdir(tmp_path) if p.endswith(".jaxexp")]
    assert len(blobs) == 1
    # different salt -> different entry
    g3 = ac.aot_jit(f, "smoke", "salt1", enabled=True)
    g3(d, y)
    blobs = [p for p in os.listdir(tmp_path) if p.endswith(".jaxexp")]
    assert len(blobs) == 2
    importlib.reload(ac)  # restore default cache dir for other tests
