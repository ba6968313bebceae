"""Backpressure strategies for the streaming sink path.

≙ reference ``BackpressureStrategy`` (``src/core/util/pipeline/
backpressure.rs:15-30``) selected per junction
(``stream_junction.rs:144-152``): Drop / Block / BlockWithTimeout /
ExponentialBackoff / CircuitBreaker.

Spark mapping — Structured Streaming's micro-batch admission IS the
reference's **Block** strategy (``maxFilesPerTrigger`` /
``maxOffsetsPerTrigger`` bound what a trigger admits; producers "block"
because unread input simply waits in the source). The remaining strategies
act at the sink, where a slow/failing downstream is the thing applying
pressure:

- **Drop**: admit at most ``budget`` rows per epoch (earliest by arrival
  order — a deterministic head, not a sample), count the rest as dropped;
  fire-and-forget semantics with conservation metrics.
- **ExponentialBackoff**: retry the failed epoch write with doubling delay
  up to ``max_delay_ms``, then re-raise (the streaming engine then retries
  the epoch — exactly-once sinks make that idempotent).
- **BlockWithTimeout**: retry until a wall deadline, then DROP the epoch
  (recorded) instead of failing the query.
- **CircuitBreaker**: fail fast once ``failure_threshold`` consecutive
  failures accumulate; half-open after ``recovery_timeout_ms``.

All wrappers compose around any ``foreachBatch`` callable (e.g.
``ExactlyOnceParquetSink.foreach_batch()``); ``sleeper``/``clock`` are
injectable for deterministic tests.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import functions as F


class DropOverflowSink:
    """Admit at most ``budget`` rows per epoch by arrival order; drop and
    count the overflow (reference ``Drop`` — fire and forget, with the
    handler's ``total_dropped_events`` metric)."""

    def __init__(self, inner: Callable, budget: int, order_col: str = "__seq"):
        self.inner = inner
        self.budget = int(budget)
        self.order_col = order_col
        self.total_dropped = 0
        self.total_admitted = 0

    def __call__(self, df, epoch_id: int) -> None:
        n = df.count()
        if n <= self.budget:
            admitted = df
            dropped = 0
        else:
            admitted = df.orderBy(F.col(self.order_col)).limit(self.budget)
            dropped = n - self.budget
        self.total_dropped += dropped
        self.total_admitted += n - dropped
        self.inner(admitted, epoch_id)

    def metrics(self) -> dict:
        return {
            "total_dropped_events": self.total_dropped,
            "total_admitted_events": self.total_admitted,
        }


class BackoffSink:
    """Retry a failing epoch write with exponential backoff
    (``ExponentialBackoff { max_delay_ms }``): delays double from
    ``base_delay_ms`` up to ``max_delay_ms``; after ``max_retries`` the
    error propagates (the engine's own epoch retry takes over). With
    ``drop_on_timeout`` (``BlockWithTimeout``) the epoch is dropped and
    counted instead of re-raised."""

    def __init__(
        self,
        inner: Callable,
        base_delay_ms: int = 10,
        max_delay_ms: int = 1000,
        max_retries: int = 5,
        drop_on_timeout: bool = False,
        sleeper: Callable[[float], None] = time.sleep,
    ):
        self.inner = inner
        self.base_delay_ms = base_delay_ms
        self.max_delay_ms = max_delay_ms
        self.max_retries = max_retries
        self.drop_on_timeout = drop_on_timeout
        self.sleeper = sleeper
        self.total_backpressure_events = 0
        self.total_timeout_events = 0
        self.delays_ms: list[float] = []

    def __call__(self, df, epoch_id: int) -> None:
        delay = float(self.base_delay_ms)
        for attempt in range(self.max_retries + 1):
            try:
                self.inner(df, epoch_id)
                return
            except Exception:
                self.total_backpressure_events += 1
                if attempt == self.max_retries:
                    if self.drop_on_timeout:
                        self.total_timeout_events += 1
                        return
                    raise
                self.delays_ms.append(delay)
                self.sleeper(delay / 1000.0)
                delay = min(delay * 2, float(self.max_delay_ms))


class CircuitBreakerSink:
    """Fail fast after ``failure_threshold`` consecutive failures
    (``CircuitBreaker``): while OPEN, epochs are rejected without touching
    the sink until ``recovery_timeout_ms`` passes; the next epoch then
    probes half-open — success closes the circuit, failure re-opens it."""

    def __init__(
        self,
        inner: Callable,
        failure_threshold: int = 3,
        recovery_timeout_ms: int = 1000,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.inner = inner
        self.failure_threshold = failure_threshold
        self.recovery_timeout_ms = recovery_timeout_ms
        self.clock = clock
        self.failures = 0
        self.opened_at: float | None = None
        self.total_circuit_breaks = 0

    @property
    def state(self) -> str:
        if self.opened_at is None:
            return "closed"
        waited_ms = (self.clock() - self.opened_at) * 1000.0
        return "half_open" if waited_ms >= self.recovery_timeout_ms else "open"

    def __call__(self, df, epoch_id: int) -> None:
        if self.state == "open":
            self.total_circuit_breaks += 1
            raise RuntimeError(
                f"circuit open: {self.failures} consecutive sink failures"
            )
        try:
            self.inner(df, epoch_id)
        except Exception:
            self.failures += 1
            if self.failures >= self.failure_threshold:
                self.opened_at = self.clock()
            raise
        else:
            self.failures = 0
            self.opened_at = None
