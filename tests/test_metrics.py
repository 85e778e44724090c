"""Metrics: Prometheus text exposition + PushGateway push (reference:
scripts/Prometheus/PythonBenchmark.py:13-40, INSTALL.md)."""

import http.server
import threading

from iresearch_tpu.utils.metrics import MetricsRegistry


def test_render_text_exposition():
    m = MetricsRegistry()
    m.gauge("query_time_us", 12.5, {"category": "HighTerm"}, help_="exec time")
    m.gauge("query_time_us", 3.25, {"category": "LowTerm"})
    m.gauge("wall_clock_s", 7.0)
    text = m.render()
    assert "# HELP query_time_us exec time" in text
    assert "# TYPE query_time_us gauge" in text
    assert 'query_time_us{category="HighTerm"} 12.5' in text
    assert "wall_clock_s 7.0" in text


def test_push_gateway_roundtrip():
    received = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            received["path"] = self.path
            received["body"] = self.rfile.read(n).decode()
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        m = MetricsRegistry()
        m.gauge("qps", 17000.0)
        ok = m.push(f"127.0.0.1:{srv.server_port}", job="bench")
        assert ok
        assert received["path"] == "/metrics/job/bench"
        assert "qps 17000.0" in received["body"]
    finally:
        srv.shutdown()
        t.join()


def test_push_unreachable_returns_false():
    m = MetricsRegistry()
    m.gauge("x", 1.0)
    # reserved TEST-NET address: connection refused/timeout, never raises
    assert m.push("127.0.0.1:1", timeout=0.5) is False
