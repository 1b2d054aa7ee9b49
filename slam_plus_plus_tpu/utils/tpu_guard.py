"""Operational guards for the remote-TPU (axon tunnel) sessions.

Two documented failure modes (docs/BENCH_NOTES.md round 3/4):
  * reconnecting a new client while/after another process used the tunnel
    can hang 10+ minutes — so all TPU work in one workflow must share one
    process, enforced here with an exclusive file lock;
  * transient `TPU backend error (Internal)` aborts a row — retried here
    with backoff.

The reference has no analogue (its GPU path guards signals via CGPUGuard,
reference src/slam/LinearSolver_Schur_GPU.cpp:120-137 — same role, local
hardware).
"""

from __future__ import annotations

import fcntl
import os
import time
from typing import Callable, Tuple


LOCK_PATH = os.environ.get("SLAMPP_TPU_LOCK", "/tmp/slampp_tpu.lock")

TRANSIENT_MARKERS = ("INTERNAL", "Internal", "UNAVAILABLE", "Unavailable",
                     "DEADLINE_EXCEEDED", "Socket closed",
                     "failed to connect")


class TpuSessionLock:
    """Exclusive advisory lock serializing TPU client processes on this
    machine.  Use as a context manager around ALL tunnel work in a driver;
    a second driver blocks (with a console note) instead of racing the
    tunnel into a multi-minute reconnect hang."""

    def __init__(self, path: str = LOCK_PATH, poll_s: float = 5.0):
        self.path = path
        self.poll_s = poll_s
        self._fh = None

    def __enter__(self):
        self._fh = open(self.path, "w")
        t0 = time.time()
        while True:
            try:
                fcntl.flock(self._fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except BlockingIOError:
                if time.time() - t0 < self.poll_s + 1:
                    print(f"[tpu_guard] waiting for {self.path} "
                          "(another TPU client is active)", flush=True)
                time.sleep(self.poll_s)
        self._fh.write(str(os.getpid()))
        self._fh.flush()
        return self

    def __exit__(self, *exc):
        try:
            fcntl.flock(self._fh, fcntl.LOCK_UN)
            self._fh.close()
        except OSError:
            pass
        return False


def is_transient(exc: BaseException) -> bool:
    s = f"{type(exc).__name__}: {exc}"
    return any(m in s for m in TRANSIENT_MARKERS)


def with_retries(fn: Callable, attempts: int = 3, backoff_s: float = 20.0,
                 label: str = "tpu op"):
    """Run fn(); retry transient tunnel/backend errors with linear backoff.
    Non-transient exceptions propagate immediately."""
    last = None
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by is_transient
            if not is_transient(e) or k == attempts - 1:
                raise
            last = e
            wait = backoff_s * (k + 1)
            print(f"[tpu_guard] transient failure in {label} "
                  f"(attempt {k + 1}/{attempts}): {e}; retrying in "
                  f"{wait:.0f}s", flush=True)
            time.sleep(wait)
    raise last
