"""The quiver native columnar file format — a PySpark-native re-implementation
of the reference strawboat/Quiver on-disk layout (SURVEY.md §1), pyarrow/numpy
vectorized throughout.

File envelope (reference: /root/reference/src/write/writer.rs:91-167):

    "ARROW2" magic + 2 pad bytes
    per leaf column, contiguous pages
    footer: schema IPC bytes | meta block | schema_size u32 | meta_size u32
            | EOS (0xFFFFFFFF + 0 i32)

Page layouts (reference: README.md:28-76):

    non-nullable: codec u8 | compressed u32 | uncompressed u32 | payload
    nullable:     def_levels_len u32 | def_levels (hybrid-RLE bitpacked) | ^
    binary basic: two back-to-back blocks (offsets then values), each framed
"""

from quiver_spark.format.constants import (  # noqa: F401
    BASIC_CODECS,
    CODEC_NAMES,
    EOS,
    MAGIC,
    NAME_TO_CODEC,
)
