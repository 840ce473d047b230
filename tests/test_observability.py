"""O-01/O-02: /metrics, /healthz, /ready endpoints over accumulator
snapshots (reference src/metrics/mod.rs:1-10, src/main.rs:115-133,279-353)."""

from __future__ import annotations

import urllib.error
import urllib.request

import pytest

from etl_rust_spark.observability import MetricsServer, prometheus_text


def _get(port: int, path: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


@pytest.fixture()
def server():
    srv = MetricsServer(port=0).start()
    yield srv
    srv.stop()


def test_welcome_and_health(server):
    # Bodies mirror the reference handlers verbatim (src/main.rs:115-133).
    assert _get(server.port, "/") == (200, "Welcome to ETL Metrics Server.")
    assert _get(server.port, "/healthz") == (200, "Alive")


def test_ready_gates_on_event(server):
    code, _ = _get(server.port, "/ready")
    assert code == 503
    server.ready.set()
    assert _get(server.port, "/ready") == (200, "Ready")


def test_metrics_exposition_format(server):
    server.register("rpc", lambda: {"request_count": 7, "failed_request_count": 2})
    code, body = _get(server.port, "/metrics")
    assert code == 200
    assert "# HELP request_count Total number of requests for all APIs" in body
    assert "# TYPE request_count counter" in body
    assert "request_count 7" in body
    assert "failed_request_count 2" in body


def test_metrics_merges_groups_and_survives_dead_source(server):
    server.register("a", lambda: {"published": 3})
    server.register("b", lambda: {"published": 4})
    server.register("dead", lambda: 1 / 0)
    _, body = _get(server.port, "/metrics")
    assert "published 7" in body


def test_unknown_path_404(server):
    code, _ = _get(server.port, "/nope")
    assert code == 404


def test_prometheus_text_pure():
    txt = prometheus_text({"g": {"x_total": 1}})
    assert txt.endswith("\n") and "x_total 1" in txt


def test_spark_accumulator_snapshot_scrape(spark):
    """End to end: worker-side accumulator adds show up in a scrape."""
    from etl_rust_spark.sources.rpc import RpcMetrics

    m = RpcMetrics.create(spark)
    acc = m.request_count
    spark.sparkContext.parallelize(range(8), 4).foreach(lambda _: acc.add(1))
    srv = MetricsServer(port=0).start()
    try:
        srv.register("rpc", m.snapshot)
        _, body = _get(srv.port, "/metrics")
        assert "request_count 8" in body
    finally:
        srv.stop()


def test_cli_metrics_port_flag_wired():
    """--metrics-port parses and is a global flag (smoke, no Spark run)."""
    from etl_rust_spark.__main__ import main

    with pytest.raises(SystemExit):  # missing required subcommand args
        main(["--metrics-port", "0", "index-range"])
