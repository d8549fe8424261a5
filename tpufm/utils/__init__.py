from tpufm.utils.encoding import (
    encode_bases,
    decode_bases,
    fuse_kmer_codes,
    BASE_ORDER,
)
from tpufm.utils.timer import Timer

__all__ = [
    "encode_bases",
    "decode_bases",
    "fuse_kmer_codes",
    "BASE_ORDER",
    "Timer",
]
