"""Segment merging for consolidation.

Reference: core/index/merge_writer.{hpp,cpp} — k-way merge of segment
readers remapping doc ids (dropping masked docs), union of term postings,
column remap. Here the merge is vectorized: decode every entry of each
segment at once, remap docs/terms with numpy, stable-sort by merged term id
(doc order is preserved because segment doc ranges are disjoint and
ascending), and re-encode through the standard block-pool encoder.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from iresearch_tpu.formats.bitpack import BITS, unpack_blocks
from iresearch_tpu.formats.columnstore import column_from_parts, column_parts
from iresearch_tpu.formats.postings import FieldPostings, encode_field_postings
from iresearch_tpu.formats.spec import BLOCK, NUM_CLASSES, TermCols
from iresearch_tpu.index.segment import SegmentData, SegmentReader


def _decode_all_entries(fp: FieldPostings):
    """Decode every posting entry of a field in one vectorized pass.

    Returns (tid_of_entry, e_doc, e_freq, pos_offsets) in entry order —
    entry order is (term asc, doc asc) by construction.
    """
    T = fp.num_terms
    if T == 0:
        z = np.zeros(0, np.int64)
        return z, z.astype(np.uint32), z.astype(np.uint32), z
    df = fp.entries[:, TermCols.DF].astype(np.int64)
    tid_of_entry = np.repeat(np.arange(T, dtype=np.int64), df)
    E = int(df.sum())
    e_doc = np.empty(E, np.uint32)
    e_freq = np.empty(E, np.uint32)
    # per-class vectorized block decode
    ptr = np.zeros(T + 1, np.int64)
    np.cumsum(df, out=ptr[1:])
    def scatter_decoded(cls_col, start_col, decode_rows, out):
        """Per-class vectorized decode of the valid prefix of each term."""
        for c in range(NUM_CLASSES):
            sel = np.flatnonzero(fp.entries[:, cls_col] == c)
            if len(sel) == 0:
                continue
            nb = fp.entries[sel, TermCols.NBLOCKS].astype(np.int64)
            b0 = fp.entries[sel, start_col].astype(np.int64)
            rows = np.repeat(b0, nb) + (
                np.arange(int(nb.sum())) - np.repeat(np.cumsum(nb) - nb, nb)
            )
            flat = decode_rows(c, rows).reshape(-1)
            term_df = df[sel]
            blk_base = np.repeat((np.cumsum(nb) - nb) * BLOCK, term_df)
            within = np.arange(int(term_df.sum())) - np.repeat(
                np.cumsum(term_df) - term_df, term_df
            )
            dst = np.repeat(ptr[sel], term_df) + within
            out[dst] = flat[blk_base + within].astype(np.uint32)

    def decode_docs(c, rows):
        deltas = unpack_blocks(fp.doc_words[c][rows], BITS[c]).astype(np.uint64)
        return fp.base[c][rows].astype(np.uint64)[:, None] + np.cumsum(deltas, axis=1)

    def decode_freqs(c, rows):
        return unpack_blocks(fp.freq_words[c][rows], BITS[c])

    scatter_decoded(TermCols.DCLS, TermCols.DSTART, decode_docs, e_doc)
    scatter_decoded(TermCols.FCLS, TermCols.FSTART, decode_freqs, e_freq)
    pos_off = np.zeros(E, np.int64)
    if E:
        np.cumsum(e_freq[:-1], out=pos_off[1:])
    return tid_of_entry, e_doc, e_freq, pos_off


def merge_segments(
    readers: List[SegmentReader], sort=None, return_doc_maps: bool = False
):
    """Merge segments into one, dropping masked docs and remapping ids.

    ``sort`` (an index.writer.SortSpec) re-applies the primary sort to the
    merged doc ids (reference: merge_writer honors the comparator).
    ``return_doc_maps``: also return the per-input old->new doc maps
    (-1 = dropped), used by concurrent consolidation to remap deletes that
    landed while the merge ran (reference: CandidateMapping,
    index_writer.cpp:388-400).
    """
    # doc id remap: alive docs numbered sequentially across segments
    doc_maps = []
    new_num_docs = 0
    for sr in readers:
        alive = sr.alive
        m = np.full(sr.num_docs, -1, np.int64)
        idx = np.flatnonzero(alive)
        m[idx] = new_num_docs + np.arange(len(idx))
        new_num_docs += len(idx)
        doc_maps.append(m)

    if sort is not None and new_num_docs > 1:
        # compose the alive-compaction maps with the sort permutation
        values = {}
        for sr, dmap in zip(readers, doc_maps):
            col = sr.data.columns.get(sort.field)
            if col is None:
                continue
            for doc, value in col.items():
                nd = int(dmap[doc])
                if nd >= 0:
                    values[nd] = value
        keyfn = sort.key or (lambda b: b)

        def _key(nid):
            v = values.get(nid)
            return (v is None, keyfn(v) if v is not None else None)

        order = sorted(range(new_num_docs), key=_key, reverse=sort.descending)
        if sort.descending:  # missing-value docs always sort last
            order = [d for d in order if d in values] + [
                d for d in order if d not in values
            ]
        perm = np.empty(new_num_docs, np.int64)
        perm[np.asarray(order)] = np.arange(new_num_docs)
        doc_maps = [
            np.where(m >= 0, perm[np.maximum(m, 0)], -1) for m in doc_maps
        ]

    field_names = sorted({n for sr in readers for n in sr.data.fields})
    out_fields: Dict[str, FieldPostings] = {}
    for fname in field_names:
        merged = _merge_field(readers, doc_maps, fname, new_num_docs)
        if merged is not None:
            out_fields[fname] = merged

    # columns: vectorized remap + k-way concat + one argsort per column
    # (reference: merge_writer.cpp column merge; no per-doc Python)
    col_names = sorted({n for sr in readers for n in sr.data.columns})
    out_columns = {}
    for cname in col_names:
        part_docs, part_lens, part_blobs = [], [], []
        for sr, dmap in zip(readers, doc_maps):
            col = sr.data.columns.get(cname)
            if col is None:
                continue
            d, l, b = column_parts(col, dmap)
            part_docs.append(d)
            part_lens.append(l)
            part_blobs.append(np.frombuffer(b, np.uint8))
        docs = np.concatenate(part_docs) if part_docs else np.zeros(0, np.uint32)
        lens = np.concatenate(part_lens) if part_lens else np.zeros(0, np.int64)
        blob_arr = (
            np.concatenate(part_blobs) if part_blobs else np.zeros(0, np.uint8)
        )
        order = np.argsort(docs, kind="stable")
        starts = np.zeros(len(lens), np.int64)
        if len(lens):
            np.cumsum(lens[:-1], out=starts[1:])
        lens_o = lens[order]
        total = int(lens_o.sum())
        if total:
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(lens_o) - lens_o, lens_o
            )
            blob = blob_arr[np.repeat(starts[order], lens_o) + within].tobytes()
        else:
            blob = b""
        out_columns[cname] = column_from_parts(
            docs[order], lens_o, blob, new_num_docs
        )

    data = SegmentData(new_num_docs, out_fields, out_columns)
    if return_doc_maps:
        return data, doc_maps
    return data


def _merge_field(
    readers: List[SegmentReader],
    doc_maps: List[np.ndarray],
    fname: str,
    new_num_docs: int,
) -> Optional[FieldPostings]:
    # merged sorted term dictionary
    term_lists = []
    for sr in readers:
        fp = sr.data.fields.get(fname)
        term_lists.append(sr.terms(fname) if fp is not None else [])
    merged_terms = sorted(set().union(*term_lists)) if term_lists else []
    index = {t: i for i, t in enumerate(merged_terms)}

    all_tid = []
    all_doc = []
    all_freq = []
    all_pos = []
    all_ostart: List[np.ndarray] = []
    all_oend: List[np.ndarray] = []
    all_paylen: List[np.ndarray] = []
    all_pay: List[bytes] = []
    new_norms = np.zeros(new_num_docs, np.uint32)
    features = None
    for sr, dmap, terms in zip(readers, doc_maps, term_lists):
        fp = sr.data.fields.get(fname)
        if fp is None:
            continue
        features = fp.features if features is None else features
        keep_norm = dmap >= 0
        new_norms[dmap[keep_norm]] = fp.norms[keep_norm]
        tid_of_entry, e_doc, e_freq, pos_off = _decode_all_entries(fp)
        remap = np.fromiter((index[t] for t in terms), np.int64, count=len(terms))
        new_doc = dmap[e_doc]
        keep = new_doc >= 0
        all_tid.append(remap[tid_of_entry[keep]])
        all_doc.append(new_doc[keep].astype(np.uint32))
        kept_freq = e_freq[keep]
        all_freq.append(kept_freq)
        if fp.has_positions:
            # decode the packed pools back to the flat rank order once,
            # then gather surviving entries' runs (v4: positions_flat)
            seg_pos = fp.positions_flat()
            starts = pos_off[keep]
            lens = kept_freq.astype(np.int64)
            total = int(lens.sum())
            if total:
                within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
                idx = np.repeat(starts, lens) + within
                all_pos.append(seg_pos[idx])
                # position-parallel aux streams gather with the same index
                if fp.offs_start is not None:
                    all_ostart.append(fp.offs_start[idx])
                    all_oend.append(fp.offs_end[idx])
                if fp.pay_len is not None:
                    all_paylen.append(fp.pay_len[idx])
                    pptr = np.zeros(len(fp.pay_len) + 1, np.int64)
                    np.cumsum(fp.pay_len, out=pptr[1:])
                    all_pay.extend(
                        fp.pay_blob[pptr[i] : pptr[i + 1]] for i in idx
                    )
            else:
                all_pos.append(np.zeros(0, np.uint32))

    if not all_tid:
        return None
    tid = np.concatenate(all_tid)
    doc = np.concatenate(all_doc)
    freq = np.concatenate(all_freq)
    # (tid, doc) lexicographic order; doc ranges may interleave across
    # segments once a sort permutation is applied, so a full lexsort is
    # required (last lexsort key is primary)
    order = np.lexsort((doc, tid))
    tid_s = tid[order]
    e_doc = doc[order]
    e_freq = freq[order]
    term_ptr = np.zeros(len(merged_terms) + 1, np.int64)
    np.add.at(term_ptr, tid_s + 1, 1)
    np.cumsum(term_ptr, out=term_ptr)

    pos_flat = None
    offs = pays = None
    if all_pos:
        pos_cat = np.concatenate(all_pos) if all_pos else np.zeros(0, np.uint32)
        lens = freq.astype(np.int64)
        starts = np.zeros(len(lens), np.int64)
        if len(lens):
            np.cumsum(lens[:-1], out=starts[1:])
        lens_o = lens[order]
        starts_o = starts[order]
        total = int(lens_o.sum())
        if total:
            within = np.arange(total) - np.repeat(np.cumsum(lens_o) - lens_o, lens_o)
            fidx = np.repeat(starts_o, lens_o) + within
            pos_flat = pos_cat[fidx]
            if all_ostart:
                offs = (
                    np.concatenate(all_ostart)[fidx],
                    np.concatenate(all_oend)[fidx],
                )
            if all_paylen:
                pay_sorted = [all_pay[i] for i in fidx]
                pays = (
                    np.concatenate(all_paylen)[fidx],
                    b"".join(pay_sorted),
                )
        else:
            pos_flat = np.zeros(0, np.uint32)

    # drop terms that lost all postings to doc masks
    df = np.diff(term_ptr)
    keep_terms = np.flatnonzero(df > 0)
    if len(keep_terms) < len(merged_terms):
        kept = [merged_terms[i] for i in keep_terms]
        new_ptr = np.zeros(len(kept) + 1, np.int64)
        np.cumsum(df[keep_terms], out=new_ptr[1:])
        merged_terms = kept
        term_ptr = new_ptr

    blob = b"".join(merged_terms)
    offsets = np.zeros(len(merged_terms) + 1, np.uint64)
    np.cumsum([len(t) for t in merged_terms], out=offsets[1:])
    from iresearch_tpu.formats.spec import IndexFeatures

    return encode_field_postings(
        e_doc,
        e_freq,
        term_ptr,
        blob,
        offsets,
        new_norms,
        pos_flat=pos_flat,
        features=features if features is not None else IndexFeatures.FREQ,
        offs=offs,
        pays=pays,
    )
