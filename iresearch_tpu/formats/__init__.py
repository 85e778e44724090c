"""Index codecs (reference: core/formats/)."""

from iresearch_tpu.formats.bitpack import BITS
from iresearch_tpu.formats.spec import (
    BLOCK,
    NUM_CLASSES,
    TermCols,
    IndexFeatures,
)
from iresearch_tpu.formats.postings import FieldPostings, encode_field_postings

__all__ = [
    "BLOCK",
    "BITS",
    "NUM_CLASSES",
    "TermCols",
    "IndexFeatures",
    "FieldPostings",
    "encode_field_postings",
]
