"""Retry policy with exponential backoff, jitter, and error classification.

Re-expresses the reference's retry machinery
(reference: crates/common/src/retry.rs:90-133 ``RetryOutcome``
Cancelled|Timeout|Exhausted|Failed; :235-365 ``RetryPolicy`` —
initial/max/jitter/max_retries, doubling capped backoff, ±jitter
factor, aggressive/patient presets; :451-556 ``retry_async`` loop —
cancellation checked before each attempt and during backoff, timeouts
retryable by default, non-retryable errors fail immediately;
:681-733 message-content classification fallbacks).

Spark mapping: retries run DRIVER- or EXECUTOR-side around transport
calls inside ``foreachPartition`` writers (HTTP/Redis/NATS/ClickHouse
clients) and control-plane operations. Synchronous by design — a Spark
task is already one thread of a parallel fleet; the async structure the
reference needs for its single-process runtime is Spark's job here.
Attempt deadlines are enforced by the transports' own timeout knobs;
an attempt that exceeds its deadline raises ``TimeoutError``, which the
loop classifies exactly like the reference's elapsed-timer branch.
"""

from __future__ import annotations

import random
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, TypeVar

T = TypeVar("T")


class RetryOutcome(Exception):
    """Terminal retry-loop outcome (reference retry.rs:90-133).

    Raised from :func:`retry_call`; subclasses mirror the enum variants.
    """

    def is_cancelled(self) -> bool:
        return isinstance(self, Cancelled)

    def is_timeout(self) -> bool:
        return isinstance(self, Timeout)

    def into_inner(self) -> BaseException | None:
        """The underlying error, if this outcome carries one."""
        if isinstance(self, Exhausted):
            return self.last_error
        if isinstance(self, Failed):
            return self.error
        return None


class Cancelled(RetryOutcome):
    def __str__(self) -> str:
        return "operation cancelled"


class Timeout(RetryOutcome):
    def __init__(self, action: str):
        super().__init__(action)
        self.action = action

    def __str__(self) -> str:
        return f"timeout: {self.action}"


class Exhausted(RetryOutcome):
    def __init__(self, attempts: int, last_error: BaseException):
        super().__init__(attempts, last_error)
        self.attempts = attempts
        self.last_error = last_error

    def __str__(self) -> str:
        return f"exhausted after {self.attempts} attempts: {self.last_error}"


class Failed(RetryOutcome):
    def __init__(self, error: BaseException):
        super().__init__(error)
        self.error = error

    def __str__(self) -> str:
        return f"non-retryable error: {self.error}"


@dataclass
class RetryPolicy:
    """Exponential backoff policy (reference retry.rs:235-365).

    ``next_backoff`` returns the current backoff with ±``jitter``
    applied, then doubles the internal state capped at ``max``.
    ``max_retries=None`` retries forever until cancelled.
    """

    initial: float = 1.0  # seconds
    max: float = 60.0
    jitter: float = 0.2
    max_retries: int | None = None
    _current: float = field(init=False, repr=False)
    _rng: random.Random = field(
        init=False, repr=False, default_factory=random.Random
    )

    def __post_init__(self) -> None:
        self.jitter = min(1.0, max(0.0, self.jitter))
        self._current = self.initial

    @classmethod
    def aggressive(cls) -> "RetryPolicy":
        """Fail fast: 100ms..5s, 10% jitter, 10 attempts (retry.rs:296)."""
        return cls(initial=0.1, max=5.0, jitter=0.1, max_retries=10)

    @classmethod
    def patient(cls) -> "RetryPolicy":
        """Must eventually succeed: 5s..5min, 25% jitter, unlimited
        (retry.rs:312)."""
        return cls(initial=5.0, max=300.0, jitter=0.25, max_retries=None)

    def seed(self, n: int) -> "RetryPolicy":
        """Deterministic jitter for tests."""
        self._rng = random.Random(n)
        return self

    def next_backoff(self) -> float:
        current = self._current
        self._current = min(current * 2, self.max)
        if self.jitter > 0:
            factor = 1.0 + self._rng.uniform(-self.jitter, self.jitter)
            return max(current * factor, 1e-9)
        return current

    def reset(self) -> None:
        """Reset after success so future sequences start at ``initial``."""
        self._current = self.initial

    def should_retry(self, attempt: int) -> bool:
        return self.max_retries is None or attempt <= self.max_retries


def retry_call(
    op: Callable[[int], T],
    *,
    is_retryable: Callable[[BaseException], bool] | None = None,
    policy: RetryPolicy | None = None,
    cancel: threading.Event | None = None,
    label: str = "operation",
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``op(attempt)`` until success, mirroring retry.rs:451-556.

    - cancellation is checked before each attempt and again during the
      backoff wait (prompt shutdown through long backoffs)
    - ``TimeoutError`` from the op is retryable by default and maps to
      the ``Timeout`` outcome when retries run out without another error
    - a non-retryable error raises ``Failed`` immediately
    - exceeding ``max_retries`` raises ``Exhausted(attempts, last_error)``

    ``sleep`` is injectable so tests never wall-clock wait.
    """
    policy = policy or RetryPolicy()
    classify = is_retryable or (lambda e: is_retryable_message(str(e)))
    attempt = 0
    last_error: BaseException | None = None

    def _wait(seconds: float) -> None:
        # cancellation-aware backoff (tokio::select! equivalent)
        if cancel is not None:
            if cancel.wait(timeout=seconds):
                raise Cancelled()
        else:
            sleep(seconds)

    while True:
        if cancel is not None and cancel.is_set():
            raise Cancelled()
        attempt += 1
        if not policy.should_retry(attempt):
            if last_error is not None:
                raise Exhausted(attempt - 1, last_error)
            raise Timeout(label)
        try:
            return op(attempt)
        except TimeoutError:
            # timeouts are retryable by default (retry.rs:535-553)
            _wait(policy.next_backoff())
        except RetryOutcome:
            raise
        except Exception as e:
            if classify(e):
                last_error = e
                _wait(policy.next_backoff())
            else:
                raise Failed(e) from e


_RETRYABLE_SIGNALS = (
    "connection reset",
    "broken pipe",
    "eof",
    "end of file",
    "timeout",
    "timed out",
    "connection refused",
    "temporarily unavailable",
    "try again",
)

_PERMANENT_SIGNALS = (
    "authentication",
    "permission denied",
    "access denied",
    "unauthorized",
    "invalid",
    "not found",
)


def is_retryable_message(msg: str) -> bool:
    """Message-content classification for opaque errors
    (reference retry.rs:681-693)."""
    lower = msg.lower()
    return any(s in lower for s in _RETRYABLE_SIGNALS)


def is_permanent_failure(msg: str) -> bool:
    """Permanent-failure signals that must NOT be retried
    (reference retry.rs:718-726)."""
    lower = msg.lower()
    return any(s in lower for s in _PERMANENT_SIGNALS)
