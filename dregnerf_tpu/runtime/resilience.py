"""Failure detection and recovery.

The reference's only recovery mechanism is resume-from-latest-checkpoint
(SURVEY.md §5). This build adds an explicit resilience layer, motivated by
a real failure mode observed in deployment: transient runtime/compile-
service errors ("response body closed", "Broken pipe") killing an
otherwise-healthy training job mid-round.

  * `run_with_retries(step_fn, on_failure)`: classifies exceptions into
    transient (retry with backoff) vs fatal (save an emergency checkpoint
    via `on_failure`, then re-raise);
  * `guard_nans(tree, where)`: optional NaN tripwire for debugging runs
    (the reference asserts on NaN feature loss, train_nerf_regtr.py:209).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Optional

_TRANSIENT_MARKERS = (
    "Broken pipe",
    "response body closed",
    "length limit exceeded",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Network Error",
    "Connection reset",
)


def is_transient(exc: BaseException) -> bool:
    msg = str(exc)
    return any(m in msg for m in _TRANSIENT_MARKERS)


def run_with_retries(
    fn: Callable[[], Any],
    max_retries: int = 3,
    backoff_s: float = 5.0,
    on_failure: Optional[Callable[[BaseException], None]] = None,
) -> Any:
    """Run fn; retry transient runtime errors with exponential backoff.

    Non-transient errors (and transient ones past the retry budget) invoke
    `on_failure` (e.g. an emergency checkpoint save) and re-raise.
    """
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — classification below
            if is_transient(exc) and attempt < max_retries:
                attempt += 1
                wait = backoff_s * (2 ** (attempt - 1))
                print(
                    f"[resilience] transient failure (attempt {attempt}/"
                    f"{max_retries}), retrying in {wait:.0f}s: "
                    f"{str(exc)[:200]}",
                    flush=True,
                )
                time.sleep(wait)
                continue
            if on_failure is not None:
                try:
                    on_failure(exc)
                except Exception as save_exc:  # noqa: BLE001
                    print(f"[resilience] emergency save failed: {save_exc}")
            raise


class Watchdog:
    """In-process hang detector for long TPU runs through the axon tunnel.

    The observed failure mode (round 3, CLAUDE.md): a training process
    wedges in a futex wait mid-step — no exception, no output — so
    exception-based recovery (`run_with_retries`) never fires. The only
    safe recovery is process death + resume-from-checkpoint: a wedged
    device sync cannot be interrupted from inside the process.

    Usage::

        with Watchdog(timeout_s=1200, name="ngp") as wd:
            for step in ...:
                train_iteration(step)
                wd.beat()

    A daemon thread checks the heartbeat; if it goes stale past
    `timeout_s` the process exits hard (os._exit) with `exit_code` so an
    outer supervisor (scripts/experiments/supervise.sh, or any restart
    loop) relaunches it and training resumes from the latest checkpoint.
    timeout_s <= 0 disables the watchdog. Size timeout_s above the
    worst-case cold compile (2-15 min through the remote tunnel —
    compiles are incrementally cached, so a kill mid-compile still makes
    monotonic progress across restarts).
    """

    EXIT_CODE = 86

    def __init__(self, timeout_s: float, name: str = "",
                 exit_code: int = EXIT_CODE):
        self.timeout_s = float(timeout_s)
        self.name = name
        self.exit_code = exit_code
        self._last = time.time()
        self._stop = None

    def beat(self) -> None:
        self._last = time.time()

    def __enter__(self) -> "Watchdog":
        if self.timeout_s <= 0:
            return self
        import threading

        self._stop = threading.Event()
        self.beat()

        def watch():
            poll = max(min(self.timeout_s / 4.0, 30.0), 1.0)
            while not self._stop.wait(poll):
                stale = time.time() - self._last
                if stale > self.timeout_s:
                    import os
                    import sys

                    print(
                        f"[watchdog:{self.name}] no heartbeat for "
                        f"{stale:.0f}s (> {self.timeout_s:.0f}s) — "
                        f"exiting {self.exit_code} for supervisor restart",
                        flush=True,
                    )
                    sys.stdout.flush()
                    sys.stderr.flush()
                    os._exit(self.exit_code)

        threading.Thread(target=watch, daemon=True,
                         name=f"watchdog-{self.name}").start()
        return self

    def __exit__(self, *exc) -> None:
        if self._stop is not None:
            self._stop.set()


def guard_nans(tree: Any, where: str = "") -> None:
    """Raise if any leaf contains NaN/Inf (host-side; call sparingly)."""
    import jax
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values at {where}:{jax.tree_util.keystr(path)}"
            )
