"""Lightweight columnar codecs (numpy/pyarrow, no Spark imports).

Built from scratch per the north rule (BASELINE.json): dictionary +
RLE/bit-packed indexes, FSST-style symbol tables, frame-of-reference +
bit-packing, plain fallback, and a stats-driven auto-selector.
"""

from .column import (CODEC_NAMES, DICT_MAX_DISTINCT_RATIO, decode_column,
                     encode_column)
from .ints import decode_int64, decode_uint64, encode_int64, encode_uint64
from .kernels import bit_width, pack_bits, unpack_bits

__all__ = [
    "encode_column", "decode_column", "CODEC_NAMES",
    "DICT_MAX_DISTINCT_RATIO",
    "encode_uint64", "decode_uint64", "encode_int64", "decode_int64",
    "pack_bits", "unpack_bits", "bit_width",
]
