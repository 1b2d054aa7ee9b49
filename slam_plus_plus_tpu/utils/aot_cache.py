"""Persistent AOT program cache (jax.export blobs) — DEFAULT OFF.

The persistent XLA compilation cache removes backend *compile* time, but a
one-shot solver run still pays jax trace + StableHLO lowering for every
program it uses — measured ~5 s of an 11 s manhattan3500 incremental
replay.  This cache serializes `jax.export` blobs keyed by (program name,
caller salt, argument signature, platform/versions); a warm run
deserializes the StableHLO and never traces the original function, with
donation re-applied by a thin jit wrapper.

It ships DISABLED (see aot_jit) because both jax 0.9 AOT serialization
mechanisms proved unstable on this stack — details in aot_jit's docstring.
The integration points in the solvers pass through to plain jax.jit until
SLAMPP_AOT=1 opts in on a fixed jax.

The reference has no analogue — its solvers are ahead-of-time C++ — this
would close the "interpreter tax" gap its binaries never paid.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Optional, Sequence

import numpy as np

import jax


_CACHE_DIR: Optional[str] = None


def cache_dir() -> str:
    global _CACHE_DIR
    if _CACHE_DIR is None:
        root = os.environ.get("SLAMPP_AOT_CACHE",
                              os.path.join(os.path.expanduser("~"),
                                           ".cache", "slampp_aot"))
        os.makedirs(root, exist_ok=True)
        _CACHE_DIR = root
    return _CACHE_DIR


def salt_arrays(*arrays) -> str:
    """Fingerprint for dataset/plan-dependent constants baked into traces."""
    h = hashlib.sha1()
    for a in arrays:
        a = np.asarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:16]


def _canon(args):
    """Strong-type python scalars so build-time avals == call-time avals."""
    x64 = jax.config.jax_enable_x64

    def c(x):
        if isinstance(x, bool):
            return np.bool_(x)
        if isinstance(x, int):
            return np.int64(x) if x64 else np.int32(x)
        if isinstance(x, float):
            return np.float64(x) if x64 else np.float32(x)
        return x

    return jax.tree_util.tree_map(c, args)


def _sig_of(args) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            parts.append(f"{np.asarray(leaf).dtype if isinstance(leaf, np.generic) else leaf.dtype}"
                         f"{tuple(leaf.shape)}")
        else:
            parts.append(f"py:{type(leaf).__name__}")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:16]


class AotFn:
    """Lazy AOT-cached jitted function; the first call fixes the signature."""

    def __init__(self, fn: Callable, name: str, salt: str,
                 donate_argnums: Sequence[int] = ()):
        self._fn = fn
        self._name = name
        self._salt = salt
        self._donate = tuple(donate_argnums)
        self._callable = None

    def _build(self, args):
        from jax import export
        platform = jax.default_backend()
        key = hashlib.sha1(
            f"{self._name}|{self._salt}|{_sig_of(args)}|{platform}|"
            f"{jax.config.jax_enable_x64}|{jax.__version__}|"
            f"{os.uname().machine}|{self._donate}".encode()).hexdigest()
        path = os.path.join(cache_dir(), key + ".jaxexp")
        dbg = os.environ.get("SLAMPP_AOT_DEBUG")
        exp = None
        if os.path.exists(path):
            try:
                if dbg:
                    print(f"[aot] loading {self._name}", flush=True)
                with open(path, "rb") as f:
                    exp = export.deserialize(bytearray(f.read()))
            except Exception:
                exp = None
        if exp is None:
            if dbg:
                print(f"[aot] exporting {self._name}", flush=True)
            exp = export.export(jax.jit(self._fn))(*args)
            try:
                blob = exp.serialize()
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
            except Exception:
                pass  # unserializable program: still usable this process
        # plain def wrapper: inspect.signature() on Exported.call recurses
        # to a stack overflow inside jax.jit's signature probe (jax 0.9)
        def call_fn(*a):
            return exp.call(*a)
        self._callable = jax.jit(call_fn, donate_argnums=self._donate)

    def __call__(self, *args):
        args = _canon(args)
        if self._callable is None:
            self._build(args)
        return self._callable(*args)


def aot_jit(fn: Callable, name: str, salt: str,
            donate_argnums: Sequence[int] = (),
            enabled: Optional[bool] = None) -> Callable:
    """AOT-cached drop-in for jax.jit(fn, donate_argnums=...).

    enabled=None reads SLAMPP_AOT.  DEFAULT OFF: both jax 0.9 AOT
    mechanisms proved unstable on this stack and the risk is not worth the
    ~5 s tracing they would save per one-shot run —
      * jax.export: deserialization intermittently segfaults inside
        flatbuffers / AbstractMesh.__hash__ when several deserialized
        modules are loaded and executed in one process (reproduced with
        single-module loads working fine in isolation);
      * jax.experimental.serialize_executable: XLA:CPU deserialization
        fails with "Function <fused-kernel> not found" on scan-heavy
        programs.
    The wiring is kept (and covered by a smoke test) so the cache can be
    turned on (SLAMPP_AOT=1) when a fixed jax lands."""
    if enabled is None:
        env = os.environ.get("SLAMPP_AOT", "off")
        if env == "auto":
            enabled = jax.default_backend() == "cpu"
        else:
            enabled = env not in ("0", "off", "false", "auto")
    only = os.environ.get("SLAMPP_AOT_ONLY")
    if only is not None and name not in only.split(","):
        enabled = False
    if os.environ.get("SLAMPP_AOT_NODONATE"):
        donate_argnums = ()
    if not enabled:
        return jax.jit(fn, donate_argnums=donate_argnums)
    return AotFn(fn, name, salt, donate_argnums)


_REGISTERED = set()


def register_namedtuples(*classes) -> None:
    """Register NamedTuple output types for export serialization."""
    from jax import export
    for cls in classes:
        if cls in _REGISTERED:
            continue
        name = f"{cls.__module__}.{cls.__qualname__}"
        try:
            export.register_namedtuple_serialization(cls,
                                                     serialized_name=name)
        except ValueError:
            pass  # already registered in this process
        _REGISTERED.add(cls)
