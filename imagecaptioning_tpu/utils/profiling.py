"""Tracing / profiling hooks.

The reference's only instrumentation is wall-clock `time.time()` around
`forward_train` logged as 'epoch time in ms' (`train_LSTM.py:83-90`) and
a vestigial `opt.timing` flag that is never read (`LSTM_opts.py:52`).
Here `timing` actually does something:

- `StepTimer`: per-step host timing with percentile summary — the
  'epoch time in ms' field stays in the loss history for log parity.
- `trace(logdir)`: context manager around `jax.profiler` producing a
  TensorBoard-loadable device trace of the jitted steps.
- `enable_nan_debugging()`: the TPU-native stand-in for the reference's
  always-on `torch.autograd.set_detect_anomaly(True)` — jit purity
  removes the race class, NaN checks remain (`jax_debug_nans`).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StepTimer:
    """Accumulates per-step wall times (ms)."""

    def __init__(self):
        self.times_ms: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times_ms.append((time.perf_counter() - self._t0) * 1000.0)
        return False

    @property
    def last_ms(self) -> float:
        return self.times_ms[-1] if self.times_ms else float("nan")

    def summary(self) -> Dict[str, float]:
        import numpy as np
        if not self.times_ms:
            return {}
        a = np.asarray(self.times_ms)
        return {"mean_ms": float(a.mean()),
                "p50_ms": float(np.percentile(a, 50)),
                "p90_ms": float(np.percentile(a, 90)),
                "p99_ms": float(np.percentile(a, 99)),
                "steps": int(a.size)}


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace when `logdir` is set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    import jax
    jax.config.update("jax_debug_nans", enable)
