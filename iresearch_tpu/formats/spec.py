"""On-device postings format constants.

Reference format (core/formats/formats_10.cpp:90-333): 128-doc bit-packed
delta blocks with embedded 9-level skip lists, bitwidth chosen per block.

TPU-native format: a posting list is a run of rows in one of three
*width-class pools* — ``[rows, 128]`` arrays of u8/u16/u32 — holding within-
block doc-id deltas and term frequencies, plus a parallel u32 ``base`` array
holding each block's absolute first doc id.  Consequences:

* every block decodes independently (``docs = base + cumsum(deltas)``) so
  decode is embarrassingly parallel across the block axis — the role the
  skip list played for seeks is served by ``base``/``max_doc`` metadata;
* the bitwidth is class-quantized (8/16/32) instead of arbitrary: decode is
  a dtype cast, no cross-word bit surgery, and gathers stay aligned;
* the final partial block is padded with ``delta=0, freq=0``: a padded lane
  repeats the previous doc id with zero frequency, which contributes
  *exactly zero* score and zero match count — no masks needed anywhere in
  the execution path.
"""

from __future__ import annotations

from enum import IntEnum, IntFlag

import numpy as np

# Docs per postings block (reference: format_traits::block_size == 128,
# formats_10.cpp:90). 128 is also the TPU lane count — a block is one vector.
BLOCK = 128

# Width classes for delta/freq pools.
CLASS_DTYPES = (np.uint8, np.uint16, np.uint32)
NUM_CLASSES = len(CLASS_DTYPES)
CLASS_LIMITS = (1 << 8, 1 << 16, 1 << 32)


class TermCols(IntEnum):
    """Column layout of the per-term entry table (u32 ``[num_terms, 8]``)."""

    DF = 0         # document frequency
    TTF = 1        # total term frequency (sum of freqs)
    CLS = 2        # width class of this list's delta/freq blocks
    BSTART = 3     # first block row within the class pools
    NBLOCKS = 4    # number of blocks
    POS_BASE = 5   # offset of this list's positions in the flat position pool
    MAX_FREQ = 6   # max in-doc frequency (block-max scoring upper bound)
    MIN_NORM = 7   # min doc length among this term's docs (score upper bound)


NUM_TERM_COLS = 8


class IndexFeatures(IntFlag):
    """Which per-posting payloads a field records.

    Reference: core/index/index_features.hpp:40 (FREQ/POS/OFFS/PAY bitset).
    """

    NONE = 0
    FREQ = 1
    POS = 2
    OFFS = 4
    PAY = 8


def width_class(max_value: np.ndarray | int) -> np.ndarray | int:
    """Smallest class whose dtype can hold ``max_value``."""
    return np.digitize(max_value, (CLASS_LIMITS[0], CLASS_LIMITS[1]))
