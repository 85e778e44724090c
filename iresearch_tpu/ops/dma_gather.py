"""Batched contiguous row-slice gather at DMA speed.

The batched dslice tier slices each query's contiguous [R, wpb] postings
rows out of the class pools. Under ``vmap`` XLA lowers those
dynamic_slices to per-ELEMENT gathers (~8 ns/element on v5e): 75
LowTerm queries x 64 rows x ~104 words = 4.3 ms — 30x the bytes' HBM
cost. This kernel instead issues ONE async DMA per (query, pool): the
rows are contiguous in HBM, so each copy runs at stream speed and the
whole batch costs ~Q x P DMA issues (~us each).

Reference analog: the postings_reader block refill loop
(formats_10.cpp:2089-2120) — a seek + sequential block read, never a
scatter/gather.

Mosaic notes: pools stay in ANY (HBM) and are sliced with dynamic
``pl.ds`` starts read from the scalar-prefetch operand; output blocks
are (1, R, wpb) per grid step (leading unit dim — see ops/decode.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np


@functools.partial(jax.jit, static_argnames=("R", "interpret"))
def dma_row_slices(
    pools: Tuple,  # P x u32 [rows_p, wpb_p] (device-resident, zero tail)
    starts,  # i32 [Q, P] first row per (query, pool); start+R in bounds
    *,
    R: int,
    interpret: bool = False,
):
    """P x u32 [Q, R, wpb_p]: pools[p][starts[q, p] : starts[q, p]+R].

    Callers must guarantee ``starts + R <= rows_p`` (the DeviceField
    pools carry a DSLICE_PAD zero tail for exactly this — there is no
    XLA-style clamping here).
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = len(pools)
    Q = starts.shape[0]

    def kernel(starts_ref, *refs):
        pool_refs = refs[:P]
        out_refs = refs[P : 2 * P]
        sems = refs[2 * P]
        q = pl.program_id(0)
        dmas = []
        for p in range(P):
            st = starts_ref[q, p]
            dmas.append(
                pltpu.make_async_copy(
                    pool_refs[p].at[pl.ds(st, R), :],
                    out_refs[p].at[0],
                    sems.at[p],
                )
            )
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(P)],
        out_specs=[
            pl.BlockSpec(
                (1, R, pools[p].shape[1]), lambda q, s: (q, 0, 0)
            )
            for p in range(P)
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((P,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Q, R, pools[p].shape[1]), pools[p].dtype)
            for p in range(P)
        ],
        interpret=interpret,
    )(jnp.asarray(starts, jnp.int32), *pools)
