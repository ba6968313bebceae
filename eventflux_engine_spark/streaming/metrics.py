"""Per-query metrics: latency / throughput / buffered-state trackers fed by
Spark's ``StreamingQueryListener``.

≙ reference ``LatencyTracker`` / ``ThroughputTracker`` /
``BufferedEventsTracker`` (``src/core/util/metrics.rs:21-126``) — there each
processor stamps counters per event; here Spark already measures every
micro-batch, so the trackers aggregate the listener's progress events:

- **throughput**: total input rows + per-batch ``processedRowsPerSecond``;
- **latency**: per-batch trigger wall time (``durationMs.triggerExecution``)
  — total/count, average on demand, exactly the LatencyTracker contract;
- **buffered events**: the last reported stateful-operator row count
  (``stateOperators.numRowsTotal``).

One listener instance serves many queries (keyed by query name, falling
back to id), like the reference's global ``*_BY_STREAM`` registries. Merge
with an exactly-once sink's commit-marker metrics via ``merged_metrics`` —
the listener sees engine-side rates, the markers see committed output; the
pair is the full per-query picture.
"""

from __future__ import annotations

import threading
from collections import defaultdict

from pyspark.sql.streaming import StreamingQueryListener


class QueryMetricsListener(StreamingQueryListener):
    def __init__(self):
        self._lock = threading.Lock()
        self._id_to_key: dict[str, str] = {}
        self._by_query: dict[str, dict] = defaultdict(
            lambda: {
                "batches": 0,
                "input_rows": 0,
                "latency_ms_total": 0.0,
                "latency_ms_max": 0.0,
                "processed_rows_per_sec": [],
                "buffered_rows": 0,
                "terminated": False,
                "exception": None,
            }
        )

    # -- listener callbacks (driver-side, async) ---------------------------

    def onQueryStarted(self, event) -> None:
        key = str(event.name or event.id)
        with self._lock:
            self._by_query[key]  # materialize the tracker
            self._id_to_key[str(event.id)] = key

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            key = str(p.name) if p.name else self._id_to_key.get(str(p.id), str(p.id))
        trigger_ms = float((p.durationMs or {}).get("triggerExecution", 0))
        buffered = sum(
            getattr(s, "numRowsTotal", 0) or 0 for s in (p.stateOperators or [])
        )
        with self._lock:
            m = self._by_query[key]
            m["batches"] += 1
            m["input_rows"] += int(p.numInputRows or 0)
            m["latency_ms_total"] += trigger_ms
            m["latency_ms_max"] = max(m["latency_ms_max"], trigger_ms)
            rate = p.processedRowsPerSecond
            if rate is not None and rate == rate:  # drop NaN idle reports
                m["processed_rows_per_sec"].append(float(rate))
            m["buffered_rows"] = buffered

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            key = self._id_to_key.get(str(event.id), str(event.id))
            if key in self._by_query:
                self._by_query[key]["terminated"] = True
                self._by_query[key]["exception"] = event.exception

    # -- read side ---------------------------------------------------------

    def queries(self) -> list[str]:
        with self._lock:
            return sorted(self._by_query)

    def metrics(self, query: str) -> dict:
        """LatencyTracker/ThroughputTracker view for one query."""
        with self._lock:
            if query not in self._by_query:
                raise KeyError(
                    f"no metrics for query {query!r}; have {sorted(self._by_query)}"
                )
            m = dict(self._by_query[query])
        rates = m.pop("processed_rows_per_sec")
        batches = m["batches"]
        return {
            **m,
            "avg_latency_ms": (m["latency_ms_total"] / batches) if batches else None,
            "avg_processed_rows_per_sec": (
                sum(rates) / len(rates) if rates else None
            ),
        }

    def merged_metrics(self, query: str, sink) -> dict:
        """Listener rates + the sink's commit-marker truth for one query
        (``ExactlyOnceParquetSink.metrics``): engine-side input/latency next
        to exactly-once committed output — conservation checkable."""
        return {**self.metrics(query), "sink": sink.metrics()}
