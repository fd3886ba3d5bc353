"""Transient-error retry with exponential backoff + jitter (reference §4:
``ScyllaConnectorConfig.java:369-423`` — base 50 ms, ×2 exponential, 30 s cap,
20% jitter, ≤20 attempts; transient-vs-fatal classification in
``ScyllaStreamingChangeEventSource.java:206-291``).

Ray already retries *tasks* (lineage reconstruction); this wrapper covers the
driver-side I/O the reference retried at the worker level — listing/reading
the log directory and committing checkpoints on flaky storage. Jitter is
seeded per attempt-sequence so tests are deterministic.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

#: exceptions considered transient for file-backed logs (the analogue of the
#: reference's BusyPool/ReadTimeout/Transport taxonomy)
TRANSIENT = (OSError, IOError)

#: OSError subclasses that are FATAL despite the blanket OSError rule above —
#: a missing/forbidden path never heals by waiting, and the reference
#: explicitly separates transient from fatal classes
#: (ScyllaStreamingChangeEventSource.java:206-291)
FATAL = (
    FileNotFoundError,
    PermissionError,
    NotADirectoryError,
    IsADirectoryError,
)


class RetryPolicy:
    def __init__(
        self,
        base_ms: float = 50.0,
        factor: float = 2.0,
        cap_ms: float = 30_000.0,
        jitter: float = 0.2,
        max_attempts: int = 20,
        seed: int = 42,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.base_ms = base_ms
        self.factor = factor
        self.cap_ms = cap_ms
        self.jitter = jitter
        self.max_attempts = max_attempts
        self.seed = seed
        self.sleep = sleep

    def backoff_ms(self, attempt: int) -> float:
        """Deterministic jittered backoff for the given attempt (0-based)."""
        import numpy as np

        raw = min(self.base_ms * (self.factor**attempt), self.cap_ms)
        rng = np.random.RandomState(self.seed + attempt)
        return raw * (1.0 + self.jitter * (2.0 * rng.rand() - 1.0))

    def call(self, fn: Callable[[], T], transient: tuple = TRANSIENT, fatal: tuple = FATAL) -> T:
        """Run ``fn`` with retries; non-transient exceptions (including the
        ``fatal`` OSError subclasses) propagate immediately, transient ones
        retry up to ``max_attempts`` then re-raise."""
        last: BaseException | None = None
        for attempt in range(self.max_attempts):
            try:
                return fn()
            except transient as ex:  # noqa: PERF203
                if isinstance(ex, fatal):
                    raise
                last = ex
                if attempt == self.max_attempts - 1:
                    break
                self.sleep(self.backoff_ms(attempt) / 1000.0)
        assert last is not None
        raise last
