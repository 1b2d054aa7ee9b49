"""BAOptimizer C API (reference BAOptimizer.h:127-135): build the embedding
shim + a pure-C driver, run it as a subprocess, check convergence."""

import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")


@pytest.mark.slow
def test_c_api_driver(tmp_path):
    if shutil.which("gcc") is None or shutil.which("g++") is None:
        pytest.skip("no C toolchain")
    r = subprocess.run(["make", "-C", NATIVE, "libspp_ba_c.so"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    exe = str(tmp_path / "ba_c_test")
    r = subprocess.run(
        ["gcc", "-O2", os.path.join(NATIVE, "ba_c_test.c"), "-o", exe,
         "-L" + NATIVE, "-lspp_ba_c", "-Wl,-rpath," + NATIVE],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    r = subprocess.run(
        [exe], capture_output=True, text=True, timeout=600,
        env={**os.environ, "SLAMPP_ROOT": ROOT, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout + r.stderr
    assert "C API OK" in r.stdout, r.stdout
