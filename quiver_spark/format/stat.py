"""Codec-tree diagnostics — the engine's `stat_simple` (reference
src/stat.rs:26-152): re-parse a quiver file's page bytes and report which
codec the adaptive chooser picked per page, including the recursive
Dict-indices / Freq-exceptions sub-codecs.

Nothing here is needed to read data; it exists for the same reason the
reference's stat module does — verifying/debugging what the writer chose
(`DESCRIBE`-style, SURVEY §2.1 S1).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from quiver_spark.format import nested as nested_mod
from quiver_spark.format.constants import (
    BASIC_CODECS,
    CODEC_DICT,
    CODEC_FREQ,
    CODEC_NAMES,
)
from quiver_spark.format.reader import (
    column_leaf_ranges,
    infer_schema,
    read_meta,
)


@dataclass
class PageStat:
    codec: str
    compressed: int
    uncompressed: int
    num_values: int
    children: list["PageStat"] = field(default_factory=list)

    def tree(self) -> str:
        s = f"{self.codec}({self.compressed}B/{self.uncompressed}B)"
        if self.children:
            s += "[" + ", ".join(c.tree() for c in self.children) + "]"
        return s


def _frame_stat(buf: memoryview, num_values: int, recurse: bool = True) -> PageStat:
    codec, csize, usize = struct.unpack_from("<BII", buf, 0)
    st = PageStat(CODEC_NAMES.get(codec, f"codec{codec}"), csize, usize, num_values)
    payload = buf[9 : 9 + csize]
    if recurse and codec == CODEC_DICT:
        # payload: recursively-encoded u32 indices | n_entries u32 | entries
        st.children.append(_frame_stat(payload, num_values, recurse=False))
    elif recurse and codec == CODEC_FREQ:
        # payload: top value | bm_size u32 | roaring | recursive exceptions
        # (the exception frame offset depends on the value width, so only
        # basic vs typed is reported, matching stat_simple's depth)
        st.children.append(PageStat("exceptions", 0, 0, 0))
    return st


def stat_file(path: str) -> dict[str, list[PageStat]]:
    """Per top-level column: one PageStat per page (first leaf of nested
    columns — ancestors share structure, mirroring stat_simple's
    single-leaf view)."""
    out: dict[str, list[PageStat]] = {}
    with open(path, "rb") as f:
        schema = infer_schema(f)
        metas = read_meta(f)
        ranges = column_leaf_ranges(schema)
        for ci in range(len(schema)):
            fld = schema.field(ci)
            lo, _cnt = ranges[ci]
            meta = metas[lo]
            offs = meta.page_offsets()
            stats = []
            for pi, pm in enumerate(meta.pages):
                f.seek(int(offs[pi]))
                buf = memoryview(f.read(pm.length))
                pos = 0
                if nested_mod.is_nested_type(fld.type):
                    _slots, rep_len, def_len = struct.unpack_from("<III", buf, 0)
                    pos = 12 + rep_len + def_len
                elif fld.nullable:
                    (def_len,) = struct.unpack_from("<I", buf, 0)
                    pos = 4 + def_len
                stats.append(_frame_stat(buf[pos:], pm.num_values))
            out[fld.name] = stats
    return out


def describe(path: str) -> str:
    """Human-readable codec report (the `quiver.stat(path)` utility)."""
    lines = []
    for col, pages in stat_file(path).items():
        codecs = [p.tree() for p in pages]
        lines.append(f"{col}: {len(pages)} pages: {', '.join(codecs[:6])}"
                     + (" ..." if len(codecs) > 6 else ""))
    return "\n".join(lines)
