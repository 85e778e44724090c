"""CLI end-to-end: put -> dump -> search (host+device) -> convert.

Reference analog: the iresearch-benchmarks binary modes (utils/main.cpp).
"""

import re

import numpy as np
import pytest

from iresearch_tpu.cli.index_put import main as put_main
from iresearch_tpu.cli.index_search import build_filter, main as search_main, parse_tasks
from iresearch_tpu.cli.index_dump import main as dump_main
from iresearch_tpu.cli.index_convert import main as convert_main
from iresearch_tpu.search import filters as F

WORDS = ["apple", "berry", "cherry", "date", "elder", "fig", "grape"]


@pytest.fixture(scope="module")
def linedocs(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "lines.txt"
    rng = np.random.default_rng(3)
    with open(p, "w") as f:
        for i in range(120):
            n = int(rng.integers(3, 12))
            body = " ".join(WORDS[j] for j in rng.integers(0, len(WORDS), n))
            f.write(f"Title {i}\t2012-05-02\t{body}\n")
    return p


@pytest.fixture(scope="module")
def index_dir(linedocs, tmp_path_factory):
    d = tmp_path_factory.mktemp("idx")
    rc = put_main([
        "--in", str(linedocs), "--index-dir", str(d),
        "--threads", "2", "--batch-size", "25", "--segment-docs-max", "64",
    ])
    assert rc == 0
    return d


def test_put_and_dump(index_dir, capsys):
    rc = dump_main(["--index-dir", str(index_dir), "--postings", "--max-terms", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "120 docs" in out
    assert "field body" in out


def test_task_parsing():
    lines = [
        "HighTerm: apple # 500",
        "AndHighMed: +apple +berry # 17",
        "OrHighMed: apple berry # 99",
        "Prefix3: app~",
        "Wildcard: ap*le",
        "Fuzzy1: aple~1",
        "HighPhrase: \"apple berry\" # 3",
        "MinMatch2High2Med: 2 apple berry cherry date # 5",
        "HighNGram: 7 app ppl ple # 2",
        "Garbage line",
        "UnknownCat: xyz",
    ]
    tasks = parse_tasks(lines, 10)
    assert len(tasks) == 9
    flts = [build_filter(c, t, 16) for c, t in tasks]
    assert isinstance(flts[0], F.ByTerm) and flts[0].term == b"apple"
    assert isinstance(flts[1], F.And)
    assert flts[1].filters[0].term == b"apple"  # '+' stripped
    assert isinstance(flts[2], F.Or)
    assert isinstance(flts[3], F.ByPrefix) and flts[3].prefix == b"app"
    assert isinstance(flts[4], F.ByWildcard) and flts[4].pattern == b"ap%le"
    assert isinstance(flts[5], F.ByEditDistance) and flts[5].max_distance == 1
    assert isinstance(flts[6], F.ByPhrase)
    assert isinstance(flts[7], F.Or) and flts[7].min_match == 2
    assert isinstance(flts[8], F.ByNgramSimilarity)
    assert flts[8].threshold == pytest.approx(0.7)


def test_search_modes(index_dir, tmp_path, capsys):
    tasks = tmp_path / "bench.tasks"
    tasks.write_text(
        "HighTerm: apple # 500\n"
        "OrHighMed: apple berry # 12\n"
        "AndHighMed: +apple +berry # 7\n"
        "Prefix3: ap~\n"
    )
    for engine in ("host", "device"):
        rc = search_main([
            "--in", str(tasks), "--index-dir", str(index_dir),
            "--engine", engine, "--csv", "--topN", "10",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "HighTerm,1," in out
        assert "Prefix3,1," in out


def test_convert(index_dir, tmp_path, capsys):
    out_dir = tmp_path / "converted"
    rc = convert_main([
        "--in", str(index_dir), "--out", str(out_dir), "--consolidate",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "1 segments" in out
    # converted index answers queries identically
    from iresearch_tpu.index.reader import DirectoryReader
    from iresearch_tpu.search.host_eval import search
    from iresearch_tpu.store.directory import FSDirectory

    r1 = DirectoryReader.open(FSDirectory(str(index_dir)))
    r2 = DirectoryReader.open(FSDirectory(str(out_dir)))
    flt = F.ByTerm("body", "apple")
    h1 = search(r1, flt, k=10)
    h2 = search(r2, flt, k=10)
    assert [round(s, 4) for _, s in h1] == [round(s, 4) for _, s in h2]
