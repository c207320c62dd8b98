"""Observability: the reference's Prometheus metric surface.

The reference instruments its runtime with ``metrics::counter!/gauge!/
histogram!`` macros (e.g. runner/src/coordinator.rs, sinks/src/
clickhouse/sink.rs:155-170) and exposes them for scraping; this module
is the Spark-side equivalent — a dependency-free, thread-safe registry
with the same metric names and label sets, rendered in the Prometheus
text exposition format via the control plane's ``GET /metrics`` route.

Instrumentation points (all driver-side — the delivery loop, DLQ, and
lifecycle manager run on the driver; executor-side metrics belong to
Spark's own metric system):

- sink delivery: deltaforge_sink_events_total / _errors_total /
  _batch_total / _latency_seconds {pipeline, sink}
- exactly-once tier: deltaforge_sink_txn_aborts_total {pipeline, sink}
- DLQ: deltaforge_dlq_events_total / _evicted_total / _rejected_total /
  _entries / _saturation_ratio {pipeline}
- lifecycle: deltaforge_pipelines_total, deltaforge_pipeline_status /
  _pauses_total / _resumes_total {pipeline}
- checkpoints: deltaforge_checkpoints_total, deltaforge_last_checkpoint_ts

Histogram keeps running (count, sum, min, max) — enough for rate and
mean dashboards without bucket configuration; the exposition emits
_count/_sum (standard) plus _min/_max gauges.
"""

from __future__ import annotations

import threading
from collections import defaultdict

_LabelKey = tuple[tuple[str, str], ...]


def _key(labels: dict[str, str] | None) -> _LabelKey:
    return tuple(sorted((labels or {}).items()))


def _fmt_labels(key: _LabelKey) -> str:
    if not key:
        return ""
    return "{" + ",".join(f'{k}="{v}"' for k, v in key) + "}"


class MetricsRegistry:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[str, dict[_LabelKey, float]] = defaultdict(dict)
        self._gauges: dict[str, dict[_LabelKey, float]] = defaultdict(dict)
        self._hists: dict[str, dict[_LabelKey, list[float]]] = defaultdict(dict)

    # -- write side -------------------------------------------------------

    def inc(self, name: str, n: float = 1.0, **labels: str) -> None:
        k = _key(labels)
        with self._lock:
            self._counters[name][k] = self._counters[name].get(k, 0.0) + n

    def set(self, name: str, v: float, **labels: str) -> None:
        with self._lock:
            self._gauges[name][_key(labels)] = float(v)

    def observe(self, name: str, v: float, **labels: str) -> None:
        k = _key(labels)
        with self._lock:
            st = self._hists[name].get(k)
            if st is None:
                self._hists[name][k] = [1.0, v, v, v]  # count, sum, min, max
            else:
                st[0] += 1.0
                st[1] += v
                st[2] = min(st[2], v)
                st[3] = max(st[3], v)

    # -- read side --------------------------------------------------------

    def value(self, name: str, **labels: str) -> float | None:
        k = _key(labels)
        with self._lock:
            for table in (self._counters, self._gauges):
                if name in table and k in table[name]:
                    return table[name][k]
        return None

    def hist(self, name: str, **labels: str) -> dict | None:
        st = self._hists.get(name, {}).get(_key(labels))
        if st is None:
            return None
        return {"count": st[0], "sum": st[1], "min": st[2], "max": st[3]}

    def render_prometheus(self) -> str:
        out: list[str] = []
        with self._lock:
            for name in sorted(self._counters):
                out.append(f"# TYPE {name} counter")
                for k, v in sorted(self._counters[name].items()):
                    out.append(f"{name}{_fmt_labels(k)} {v:g}")
            for name in sorted(self._gauges):
                out.append(f"# TYPE {name} gauge")
                for k, v in sorted(self._gauges[name].items()):
                    out.append(f"{name}{_fmt_labels(k)} {v:g}")
            for name in sorted(self._hists):
                out.append(f"# TYPE {name} summary")
                for k, st in sorted(self._hists[name].items()):
                    out.append(f"{name}_count{_fmt_labels(k)} {st[0]:g}")
                    out.append(f"{name}_sum{_fmt_labels(k)} {st[1]:g}")
                    out.append(f"{name}_min{_fmt_labels(k)} {st[2]:g}")
                    out.append(f"{name}_max{_fmt_labels(k)} {st[3]:g}")
        return "\n".join(out) + "\n"

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()
            self._gauges.clear()
            self._hists.clear()


_default = MetricsRegistry()


def get_registry() -> MetricsRegistry:
    return _default
