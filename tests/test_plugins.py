"""dlopen plugin loading (reference: register.hpp:78-117, so_utils.hpp).

Builds the sample plugin from native/sample_plugin.cpp with the system
compiler, loads it through every public path (explicit load, directory
scan, registry-miss $IRS_PLUGIN_PATH fallback), and runs the plugin
analyzer end-to-end through index + search.
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def plugin_dir(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no C++ compiler")
    d = tmp_path_factory.mktemp("plugins")
    so = d / "libanalyzer-shout.so"
    subprocess.check_call(
        [
            "g++", "-shared", "-fPIC", "-O2", "-o", str(so),
            os.path.join(REPO, "native", "sample_plugin.cpp"),
        ]
    )
    # a second name for the directory-scan prefix convention
    shutil.copy(so, d / "libirs-shout2.so")
    return d


def _fresh_registry(monkeypatch):
    import iresearch_tpu.analysis.analyzers as an
    import iresearch_tpu.utils.plugins as pl

    monkeypatch.setattr(an, "_REGISTRY", dict(an._REGISTRY))
    monkeypatch.setattr(pl, "_LOADED", {})


def test_load_plugin_and_tokenize(plugin_dir, monkeypatch):
    _fresh_registry(monkeypatch)
    from iresearch_tpu.analysis import get
    from iresearch_tpu.utils.plugins import load_plugin

    names = load_plugin(str(plugin_dir / "libanalyzer-shout.so"))
    assert names == ["shout"]
    an = get("shout")
    toks = an.tokenize("hello plugin world")
    assert [t.term for t in toks] == [b"HELLO", b"PLUGIN", b"WORLD"]
    assert [t.position for t in toks] == [0, 1, 2]


def test_directory_scan(plugin_dir, monkeypatch):
    _fresh_registry(monkeypatch)
    from iresearch_tpu.utils.plugins import load_plugins

    names = load_plugins(str(plugin_dir))  # default prefix libirs-
    assert names == ["shout"]
    assert load_plugins(str(plugin_dir / "missing")) == []


def test_registry_miss_loads_from_plugin_path(plugin_dir, monkeypatch):
    _fresh_registry(monkeypatch)
    import iresearch_tpu.analysis.analyzers as an

    an._REGISTRY.pop("shout", None)
    monkeypatch.setenv("IRS_PLUGIN_PATH", str(plugin_dir))
    a = an.get("shout")  # miss -> libanalyzer-shout.so -> registered
    assert [t.term for t in a.tokenize("ok")] == [b"OK"]
    # a name with no plugin file still raises
    with pytest.raises(KeyError):
        an.get("nonexistent-analyzer")


def test_bad_plugins(plugin_dir, tmp_path, monkeypatch):
    _fresh_registry(monkeypatch)
    from iresearch_tpu.utils.plugins import PluginError, load_plugin

    with pytest.raises(PluginError):
        load_plugin(str(tmp_path / "libanalyzer-none.so"))
    junk = tmp_path / "libanalyzer-junk.so"
    junk.write_bytes(b"not a shared object")
    with pytest.raises(PluginError):
        load_plugin(str(junk))


def test_plugin_analyzer_end_to_end(plugin_dir, monkeypatch):
    """Plugin analyzer drives a real index + search round trip."""
    _fresh_registry(monkeypatch)
    from iresearch_tpu.analysis import get
    from iresearch_tpu.index.reader import DirectoryReader
    from iresearch_tpu.index.writer import (
        Field, IndexWriter, IndexWriterOptions,
    )
    from iresearch_tpu.search import filters as F
    from iresearch_tpu.search.host_eval import search as search_host
    from iresearch_tpu.search.scorers import BM25
    from iresearch_tpu.store.directory import MemoryDirectory
    from iresearch_tpu.utils.plugins import load_plugin

    load_plugin(str(plugin_dir / "libanalyzer-shout.so"))
    an = get("shout")
    d = MemoryDirectory()
    with IndexWriter(d, IndexWriterOptions(invert_backend="numpy")) as w:
        w.insert([Field("body", "hello world", analyzer=an)])
        w.insert([Field("body", "another doc", analyzer=an)])
        w.commit()
    r = DirectoryReader.open(d)
    hits = search_host(r, F.ByTerm("body", b"HELLO"), BM25(), k=10)
    assert [h[0] for h in hits] == [0]
