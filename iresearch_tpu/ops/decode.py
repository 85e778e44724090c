"""Pallas postings-block decode: gather + unpack + delta prefix-sum.

Grid step i decodes gathered block row rows[i]: the scalar-prefetched row
index arrays drive the BlockSpec index_maps, so the Pallas pipeline DMAs
exactly the gathered rows HBM->VMEM (double-buffered by the runtime); the
body unpacks pow2-bit lanes with repeat/shift/mask (pure VPU, see
formats/bitpack.py) and prefix-sums doc deltas onto the block base — the
Pallas analog of simdcomp's unpack loop (reference: formats_10.cpp:87-130
+ external/simdcomp).

Outputs match exec.executor._group_contrib's decode exactly:
  docs i32 [R, 128]   absolute doc ids
  freqs f32 [R, 128]  term frequencies (0 on padding lanes)
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from iresearch_tpu.formats.bitpack import words_per_block
from iresearch_tpu.formats.spec import BLOCK


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("bd", "bf", "interpret"))
def decode_rows_pallas(
    doc_words,  # u32 [rows_d_pool, 4*bd]
    freq_words,  # u32 [rows_f_pool, 4*bf]
    base,  # i32 [rows_d_pool]
    rows_d,  # i32 [R]
    rows_f,  # i32 [R]
    *,
    bd: int,
    bf: int,
    interpret: bool = False,
):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = rows_d.shape[0]
    wd = words_per_block(bd)
    wf = words_per_block(bf)
    gd = 32 // bd
    gf = 32 // bf
    mask_d = np.uint32(0xFFFFFFFF if bd == 32 else (1 << bd) - 1)
    mask_f = np.uint32(0xFFFFFFFF if bf == 32 else (1 << bf) - 1)

    def _unpack(w_ref, g, b, w_count, mask):
        # planar layout: pltpu.repeat TILES copies, so lane j reads word
        # j % w_count at bit (j // w_count) * b (see bitpack.pack_blocks)
        w = pltpu.repeat(w_ref[0], g, axis=1)  # [1, 128] tiled words
        lane = jax.lax.broadcasted_iota(jnp.uint32, w.shape, 1)
        shift = (lane // np.uint32(w_count)) * np.uint32(b)
        return (w >> shift) & mask

    def _prefix_sum(x):
        # inclusive scan across 128 lanes as a masked [128,128] reduce
        # (cumsum has no Pallas TPU lowering): prefix[j] = sum_{i<=j} x[i]
        ii = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
        mat = jnp.where(ii <= jj, jnp.broadcast_to(x.reshape(BLOCK, 1), (BLOCK, BLOCK)), 0)
        return mat.sum(axis=0).reshape(1, BLOCK)

    def kernel(rows_d_ref, rows_f_ref, dw_ref, fw_ref, base_ref, docs_ref, freqs_ref):
        d = _unpack(dw_ref, gd, bd, wd, mask_d)
        docs = base_ref[0, 0, 0] + _prefix_sum(d.astype(jnp.int32))
        docs_ref[0] = docs
        f = _unpack(fw_ref, gf, bf, wf, mask_f)
        # u32 -> f32 is not lowered directly; freqs fit int32 (b <= 32
        # but real freqs are doc lengths at most, far below 2^31)
        freqs_ref[0] = f.astype(jnp.int32).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rows_d, rows_f drive the index maps
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, wd), lambda i, rd, rf: (rd[i], 0, 0)),
            pl.BlockSpec((1, 1, wf), lambda i, rd, rf: (rf[i], 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, rd, rf: (rd[i], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BLOCK), lambda i, rd, rf: (i, 0, 0)),
            pl.BlockSpec((1, 1, BLOCK), lambda i, rd, rf: (i, 0, 0)),
        ],
    )

    docs, freqs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((R, 1, BLOCK), jnp.int32),
            jax.ShapeDtypeStruct((R, 1, BLOCK), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        rows_d,
        rows_f,
        doc_words.reshape(-1, 1, wd),
        freq_words.reshape(-1, 1, wf),
        base.reshape(-1, 1, 1).astype(jnp.int32),
    )
    return docs.reshape(R, BLOCK), freqs.reshape(R, BLOCK)
