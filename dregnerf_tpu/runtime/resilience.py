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
