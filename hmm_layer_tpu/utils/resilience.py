"""Failure detection and recovery for long-running training/serving.

The reference has no failure handling of any kind (SURVEY.md §5 — single
process, eager). Production TPU jobs need three mundane things, provided
here without any framework dependency:

* :func:`init_distributed_with_retries` — multi-host bring-up retries
  (pod slices routinely race their coordinator at startup).
* :class:`HangWatchdog` — detects a wedged device step (hung compile,
  stuck interconnect, dead tunnel): arm it around blocking host syncs; on
  timeout it dumps all Python thread stacks for post-mortem and invokes a
  callback (default: raise in the main thread on the next sync point via a
  flag the caller checks, since a hung XLA call cannot be interrupted
  safely from Python).
* :func:`latest_checkpoint` / ``Trainer(..., checkpoint_dir=...)`` +
  :func:`hmm_layer_tpu.utils.checkpoint.load_checkpoint` — elastic
  recovery: restart the process, reload the newest step, continue.
"""

from __future__ import annotations

import faulthandler
import glob
import os
import re
import sys
import threading
import time

__all__ = [
    "init_distributed_with_retries",
    "HangWatchdog",
    "latest_checkpoint",
]


def init_distributed_with_retries(
    max_retries: int = 5, backoff_s: float = 5.0, **kwargs
) -> None:
    """``jax.distributed.initialize`` with exponential-backoff retries.

    Multi-host TPU bring-up commonly fails transiently (coordinator not yet
    listening, DNS races); retrying with backoff is the standard remedy.
    """
    import jax

    delay = backoff_s
    for attempt in range(max_retries + 1):
        try:
            jax.distributed.initialize(**kwargs)
            return
        except Exception as e:  # noqa: BLE001 — any bring-up failure retries
            if attempt == max_retries:
                raise
            print(
                f"jax.distributed.initialize failed (attempt {attempt + 1}/"
                f"{max_retries + 1}): {e}; retrying in {delay:.0f}s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(delay)
            delay *= 2


class HangWatchdog:
    """Detect hung device steps.

    Usage::

        wd = HangWatchdog(timeout_s=300)
        for batch in batches:
            with wd:                      # arm ... disarm
                loss = float(train_step(batch))   # blocking host sync
            if wd.fired:
                ...  # diagnostics were dumped; decide: restart / reload

    On timeout the watchdog dumps every Python thread's stack to
    ``stream`` (post-mortem for "where is it stuck") and sets
    :attr:`fired`; ``on_timeout`` runs in the watchdog thread. It does NOT
    try to interrupt the hung call — safely cancelling a wedged XLA
    dispatch from Python is not possible; the supported recovery is
    process restart + checkpoint reload (:func:`latest_checkpoint`).
    """

    def __init__(self, timeout_s: float, on_timeout=None, stream=None):
        self.timeout_s = timeout_s
        self.on_timeout = on_timeout
        self.stream = stream if stream is not None else sys.stderr
        self.fired = False
        self._timer: threading.Timer | None = None

    def _fire(self):
        self.fired = True
        print(
            f"HangWatchdog: step exceeded {self.timeout_s}s — thread stacks:",
            file=self.stream,
            flush=True,
        )
        try:
            faulthandler.dump_traceback(file=self.stream)
        except Exception:  # noqa: BLE001 — diagnostics are best-effort
            pass
        if self.on_timeout is not None:
            self.on_timeout()

    def arm(self):
        self.disarm()
        self._timer = threading.Timer(self.timeout_s, self._fire)
        self._timer.daemon = True
        self._timer.start()

    def disarm(self):
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None

    def __enter__(self):
        self.arm()
        return self

    def __exit__(self, *exc):
        self.disarm()
        return False


def latest_checkpoint(checkpoint_dir: str) -> tuple[str, int] | None:
    """Newest ``step_*.npz`` in ``checkpoint_dir`` -> (path, step), or None.

    The elastic-recovery entry point: after a crash/hang restart, reload
    with ``utils.checkpoint.load_checkpoint(path, like=params)`` and resume
    from ``step``.
    """
    paths = glob.glob(os.path.join(checkpoint_dir, "step_*.npz"))
    best = None
    for p in paths:
        mt = re.search(r"step_(\d+)\.npz$", p)
        if mt:
            step = int(mt.group(1))
            if best is None or step > best[1]:
                best = (p, step)
    return best
