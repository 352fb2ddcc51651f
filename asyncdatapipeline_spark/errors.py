"""Error taxonomy — engine equivalents of the reference's error surface.

Reference (all cites /root/reference/async_data_pipeline.go):

- ``ErrNeedCancel`` sentinel (:14-16) → :class:`StopPipeline`
- ``ErrInvalidMaxWorkers`` (:18-20) → :class:`InvalidMaxWorkersError`
- ``CollectError`` wrapper with ``Unwrap`` (:22-34) → :class:`CollectError`
  (``__cause__`` is Python's unwrap)
- ``ProcessError`` wrapper carrying the failing batch (:36-48) →
  :class:`ProcessError` carrying ``epoch_id`` (and optionally a sample of
  the failing micro-batch; at 100 TB we never retain the whole batch on
  the driver — a quarantine path is the scale-safe analogue).
"""

from __future__ import annotations

from typing import Any


class PipelineError(Exception):
    """Base class for engine pipeline errors."""


class StopPipeline(PipelineError):
    """Sentinel raised by a collect/process callback to request a graceful
    stop of the whole pipeline (reference ``ErrNeedCancel``,
    async_data_pipeline.go:14-16). Not an error condition."""


class InvalidMaxWorkersError(PipelineError, ValueError):
    """Config validation failure (reference ``ErrInvalidMaxWorkers``,
    async_data_pipeline.go:18-20, checked :176-185)."""


class CollectError(PipelineError):
    """Wraps an error raised while collecting (source side).

    Reference: async_data_pipeline.go:22-34. ``raise CollectError(...)
    from exc`` preserves the cause, mirroring Go's ``Unwrap``.
    """

    def __init__(self, message: str = "collect failed", cause: BaseException | None = None):
        super().__init__(message)
        if cause is not None:
            self.__cause__ = cause

    @property
    def cause(self) -> BaseException | None:
        return self.__cause__


class ProcessError(PipelineError):
    """Wraps an error raised while processing (sink side), carrying the
    epoch id of the failing micro-batch.

    Reference: async_data_pipeline.go:36-48 (carries ``Data interface{}``;
    the engine carries ``epoch_id`` + optional small sample instead —
    holding a full 100 TB-scale batch on the driver is not viable).
    """

    def __init__(
        self,
        message: str = "process failed",
        cause: BaseException | None = None,
        epoch_id: int | None = None,
        data: Any = None,
    ):
        super().__init__(message)
        if cause is not None:
            self.__cause__ = cause
        self.epoch_id = epoch_id
        self.data = data

    @property
    def cause(self) -> BaseException | None:
        return self.__cause__
