"""Pause gate for in-flight suspend/resume without losing position.

Re-expresses the reference's pause utilities
(reference: crates/common/src/pause.rs:44-187 — ``pause_until_resumed``
blocks while a paused flag is set until resumed (True) or cancelled
(False); ``pause_with_timeout`` additionally wakes periodically for
housekeeping, returning Resumed|Cancelled|Timeout with
``should_continue`` true for Resumed and Timeout).

Spark mapping: the gate guards the DRIVER-side foreachBatch hook — a
paused pipeline finishes its in-flight micro-batch (Spark can't stop a
running job mid-batch; neither does the reference mid-event) and then
blocks before admitting the next one, holding the streaming checkpoint
where it is. This complements control.py's stop-and-restart pause
(which releases resources) with a hot pause that keeps the query warm.
"""

from __future__ import annotations

import enum
import threading


class PauseResult(enum.Enum):
    RESUMED = "resumed"
    CANCELLED = "cancelled"
    TIMEOUT = "timeout"

    def should_continue(self) -> bool:
        """Resumed and Timeout continue; Timeout means "still paused,
        do housekeeping" (pause.rs:180-186)."""
        return self in (PauseResult.RESUMED, PauseResult.TIMEOUT)


class PauseGate:
    """Pause flag + resume notification + cancellation, one object.

    Thread-safe: control-plane threads call pause/resume/cancel; the
    foreachBatch thread calls ``wait_until_resumed`` at batch
    admission.
    """

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._paused = False
        self._cancelled = False

    # -- control side ------------------------------------------------------
    def pause(self) -> None:
        with self._cond:
            self._paused = True

    def resume(self) -> None:
        with self._cond:
            self._paused = False
            self._cond.notify_all()

    def cancel(self) -> None:
        with self._cond:
            self._cancelled = True
            self._cond.notify_all()

    # -- worker side -------------------------------------------------------
    def is_paused(self) -> bool:
        with self._cond:
            return self._paused

    def is_cancelled(self) -> bool:
        with self._cond:
            return self._cancelled

    def wait_until_resumed(self) -> bool:
        """Block while paused; True = proceed, False = cancelled
        (pause.rs:75-97). Fast path returns immediately when not
        paused."""
        with self._cond:
            while self._paused and not self._cancelled:
                self._cond.wait()
            return not self._cancelled

    def wait_with_timeout(self, timeout: float) -> PauseResult:
        """Like ``wait_until_resumed`` but wakes after ``timeout``
        seconds for housekeeping while still paused (pause.rs:119-157)."""
        deadline = None
        with self._cond:
            if self._cancelled:
                return PauseResult.CANCELLED
            if not self._paused:
                return PauseResult.RESUMED
            import time

            deadline = time.monotonic() + timeout
            while self._paused and not self._cancelled:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return PauseResult.TIMEOUT
                self._cond.wait(remaining)
            return (
                PauseResult.CANCELLED if self._cancelled else PauseResult.RESUMED
            )
