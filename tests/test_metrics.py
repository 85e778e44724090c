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


def test_cap_counters_recorded():
    """No-silent-caps: dense-term drops and scored_terms_limit
    truncations surface in the metrics registry (VERDICT r2 item 10)."""
    import numpy as np

    from iresearch_tpu.formats import dense as dense_mod
    from iresearch_tpu.index.reader import DirectoryReader
    from iresearch_tpu.index.writer import (
        Field,
        IndexWriter,
        IndexWriterOptions,
    )
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.expand import expand_leaf
    from iresearch_tpu.store.directory import MemoryDirectory
    from iresearch_tpu.utils.metrics import registry

    d = MemoryDirectory()
    rng = np.random.default_rng(2)
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        for i in range(256):
            toks = [f"w{int(x):02d}" for x in rng.integers(0, 5, size=6)]
            w.insert([Field("body", " ".join(toks), analyzer="segmentation")])
        w.commit()
    r = DirectoryReader.open(d)
    sr = r.segments[0]
    before = registry().counter_value("irs_scored_terms_truncated")
    expand_leaf(F.ByPrefix("body", "w", scored_terms_limit=2), [sr])
    assert registry().counter_value("irs_scored_terms_truncated") > before

    # dense cap: shrink the budget so the drop path triggers
    old = dense_mod.DENSE_MAX_TERMS
    before_d = registry().counter_value("irs_dense_terms_dropped")
    try:
        dense_mod.DENSE_MAX_TERMS = 1
        cache = dense_mod.build_dense_cache(sr.field("body"), sr.num_docs)
        assert cache is not None and len(cache.spans) == 1
    finally:
        dense_mod.DENSE_MAX_TERMS = old
    assert registry().counter_value("irs_dense_terms_dropped") > before_d
    assert "irs_scored_terms_truncated" in registry().render()


def test_debug_asserts(monkeypatch):
    """IRS_DEBUG assertion framework (reference: IRS_ASSERT + settable
    callback, core/utils/assert.hpp)."""
    import importlib

    import iresearch_tpu.utils.debug as dbg

    monkeypatch.setenv("IRS_DEBUG", "1")
    importlib.reload(dbg)
    assert dbg.assertions_enabled()
    with __import__("pytest").raises(AssertionError):
        dbg.irs_assert(False, "boom")
    seen = []
    dbg.set_assert_callback(seen.append)
    dbg.irs_assert(False, "routed")
    assert seen == ["routed"]
    dbg.set_assert_callback(None)
    # the encoder invariant fires on malformed postings
    import numpy as np

    from iresearch_tpu.formats.postings import encode_field_postings
    from iresearch_tpu.formats.spec import IndexFeatures

    with __import__("pytest").raises(AssertionError):
        encode_field_postings(
            np.asarray([3, 1], np.uint32),  # non-ascending within a term
            np.asarray([1, 1], np.uint32),
            np.asarray([0, 2], np.int64),
            b"t", np.asarray([0, 1], np.uint64),
            np.asarray([2, 2, 2, 2], np.uint32),
            None, IndexFeatures.FREQ,
        )
    monkeypatch.setenv("IRS_DEBUG", "0")
    importlib.reload(dbg)
