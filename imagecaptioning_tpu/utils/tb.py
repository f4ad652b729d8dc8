"""Optional TensorBoard metrics channel.

The reference logs through three channels only: stdout loss lines, loss
history JSON, and results history JSON (SURVEY §5 "Metrics / logging").
Those JSON artifacts stay the source of truth (`utils/io.py`); this adds
the survey-recommended *optional* TensorBoard stream on top, enabled by
setting `tensorboard_dir` on any config. Uses torch's bundled
SummaryWriter when available and degrades to a silent no-op otherwise —
no new dependency, no behavior change when off.
"""

from __future__ import annotations

from typing import Mapping, Optional


class TBWriter:
    """Scalar event writer; a no-op unless `logdir` is set and
    torch.utils.tensorboard imports cleanly."""

    def __init__(self, logdir: Optional[str]):
        self._writer = None
        if not logdir:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._writer = SummaryWriter(log_dir=logdir)
        except Exception:                      # missing backend → no-op
            self._writer = None

    @property
    def active(self) -> bool:
        return self._writer is not None

    def scalar(self, tag: str, value, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), int(step))

    def scalars(self, values: Mapping[str, float], step: int,
                prefix: str = "") -> None:
        for k, v in values.items():
            if isinstance(v, (dict, list, tuple, str)) or v is None:
                continue                      # only scalar-like entries
            try:
                self.scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None
