"""Byte-level constants of the quiver format (reference:
src/lib.rs:34, src/write/common.rs:124-128, src/compression/mod.rs:64-82)."""

MAGIC = b"ARROW2\x00\x00"  # 6-byte magic + 2 pad (8-byte boundary)
EOS = b"\xff\xff\xff\xff\x00\x00\x00\x00"  # continuation marker + 0_i32

CODEC_NONE = 0
CODEC_LZ4 = 1
CODEC_ZSTD = 2
CODEC_SNAPPY = 3
CODEC_RLE = 10
CODEC_DICT = 11
CODEC_ONE_VALUE = 12
CODEC_FREQ = 13
CODEC_BITPACKING = 14
CODEC_DELTA_BITPACKING = 15
CODEC_PATAS = 16

BASIC_CODECS = frozenset({CODEC_NONE, CODEC_LZ4, CODEC_ZSTD, CODEC_SNAPPY})

CODEC_NAMES = {
    CODEC_NONE: "none",
    CODEC_LZ4: "lz4",
    CODEC_ZSTD: "zstd",
    CODEC_SNAPPY: "snappy",
    CODEC_RLE: "rle",
    CODEC_DICT: "dict",
    CODEC_ONE_VALUE: "one_value",
    CODEC_FREQ: "freq",
    CODEC_BITPACKING: "bitpacking",
    CODEC_DELTA_BITPACKING: "delta_bitpacking",
    CODEC_PATAS: "patas",
}
NAME_TO_CODEC = {v: k for k, v in CODEC_NAMES.items()}
