"""Benchmark / utility CLI (reference: utils/ 'iresearch-benchmarks').

Modes mirror utils/main.cpp: ``put`` (multithreaded line-doc indexer,
index-put.cpp:359), ``search`` (luceneutil task-file query bench,
index-search.cpp:490), ``dump`` (index-dump.cpp), ``convert``
(index-convert.cpp). Run as ``python -m iresearch_tpu.cli <mode> ...``.
"""
