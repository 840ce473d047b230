"""Metrics + health HTTP endpoints (O-01 / O-02).

Reference parity:
- ``/metrics`` Prometheus text endpoint with ``request_count`` /
  ``failed_request_count`` counters (src/metrics/mod.rs:1-10; server
  wiring src/main.rs:279-323, actix + PrometheusMetricsBuilder,
  env ``METRICS_PORT``).
- ``/`` welcome body "Welcome to ETL Metrics Server."
  (src/main.rs:115-120).
- ``/healthz`` liveness → "Alive", ``/ready`` readiness → "Ready"
  (src/main.rs:122-133; served on env ``HEALTH_CHECKS_PORT`` for
  kubernetes, src/main.rs:325-345).

Spark-first shape: counters live in Spark **accumulators** (workers add,
driver aggregates — the only metrics primitive that survives a
1000-executor deployment), and this server is a driver-side scrape
surface over their snapshots.  It is stdlib ``http.server`` on a daemon
thread — no web framework needed for two GETs and a text exposition —
and each executor-host metric a real cluster needs beyond these counters
comes from Spark's own metrics system, which this deliberately does not
replace.

Usage::

    srv = MetricsServer(port=9090)
    srv.register("rpc", rpc_metrics.snapshot)     # any () -> dict[str,int]
    srv.register("publish", publish_stats.snapshot)
    srv.start()
    ...
    srv.ready.set()        # flips /ready from 503 to 200 (k8s gate)
    srv.stop()

CLI: ``python -m etl_rust_spark --metrics-port N index-range ...``
starts one for the duration of the run (readiness set once the
SparkSession is up, mirroring the reference's "spawn servers, then
dispatch command" order).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

__all__ = ["MetricsServer", "prometheus_text"]

_HELP = {
    # Names and help strings follow the reference registrations
    # (src/main.rs:291-305).
    "request_count": "Total number of requests for all APIs",
    "failed_request_count": "Total number of request failures for all APIs",
}


def prometheus_text(snapshots: dict[str, dict[str, int]]) -> str:
    """Render counter snapshots in the Prometheus text exposition format.

    One ``# HELP``/``# TYPE``/value triple per counter; multi-group
    collisions (e.g. two sinks both exposing ``published``) are summed,
    matching a shared registry of named counters.
    """
    merged: dict[str, int] = {}
    for group in snapshots.values():
        for name, value in group.items():
            merged[name] = merged.get(name, 0) + int(value)
    lines: list[str] = []
    for name in sorted(merged):
        help_text = _HELP.get(name, name.replace("_", " "))
        lines.append(f"# HELP {name} {help_text}")
        lines.append(f"# TYPE {name} counter")
        lines.append(f"{name} {merged[name]}")
    return "\n".join(lines) + "\n"


class MetricsServer:
    """Driver-side `/metrics` + `/healthz` + `/ready` HTTP server."""

    def __init__(self, port: int = 0, address: str = "127.0.0.1") -> None:
        self._sources: dict[str, Callable[[], dict[str, int]]] = {}
        self.ready = threading.Event()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a) -> None:  # silence per-request stderr
                pass

            def _send(self, code: int, body: str, ctype: str) -> None:
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self) -> None:
                path = self.path.split("?", 1)[0]
                if path == "/":
                    self._send(200, "Welcome to ETL Metrics Server.", "text/plain")
                elif path == "/metrics":
                    body = prometheus_text(outer.snapshots())
                    self._send(200, body, "text/plain; version=0.0.4")
                elif path == "/healthz":
                    self._send(200, "Alive", "text/plain")
                elif path == "/ready":
                    if outer.ready.is_set():
                        self._send(200, "Ready", "text/plain")
                    else:
                        self._send(503, "Not ready", "text/plain")
                else:
                    self._send(404, "Not found", "text/plain")

        self._httpd = ThreadingHTTPServer((address, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def register(self, group: str, snapshot: Callable[[], dict[str, int]]) -> None:
        """Register a named counter group (any ``() -> dict[str, int]``)."""
        self._sources[group] = snapshot

    def snapshots(self) -> dict[str, dict[str, int]]:
        out: dict[str, dict[str, int]] = {}
        for group, fn in self._sources.items():
            try:
                out[group] = fn()
            except Exception:  # a dead source must not take down the scrape
                out[group] = {}
        return out

    def start(self) -> "MetricsServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="metrics-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
