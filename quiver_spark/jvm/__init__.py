"""JVM-side quiver writer ("quiverjvm") — the fast bulk-ingest path.

The Python sink's pure-write cost is structural: rows cross the
JVM→Python Arrow boundary before a single page is encoded (BASELINE.md
round-7 write-floor proof — a NO-OP Python Arrow sink costs the same as
the full quiver write). The Java DataSourceV2 writer under ``src/`` keeps
rows in the JVM: each task accumulates InternalRows into columnar
buffers and emits quiver files (basic codec: none/lz4/zstd) that are
byte-compatible with the Python reader — measured 0.69x parquet wall at
sf0.1 where the Python sink sits at ~2.8x (BASELINE.md round-10 table).

Division of labor: the JVM path is WRITE-ONLY bulk ingest (flat
primitive/string/decimal schemas, no adaptive typed codecs, no
generation protocol). Reads, DML, clustering, constraints, schema
evolution, and compaction all stay on the Python engine; a
post-ingest ``rebuild_manifest`` gives the scan O(1) planning.

The jar builds OFFLINE with plain javac against the bundled Spark jars
(build.sh — no network, no dependency resolution) and is checked in so
driver-owned sessions need no toolchain at run time.
"""

from __future__ import annotations

import os
import shutil
import subprocess

_JVM_DIR = os.path.dirname(os.path.abspath(__file__))
JAR_PATH = os.path.join(_JVM_DIR, "quiver-jvm-writer.jar")

#: Spark types the Java writer handles (mirrors QuiverDataWriterFactory).
_SUPPORTED_TYPES = {
    "long", "int", "integer", "short", "byte", "double", "float",
    "string", "binary", "boolean", "date", "timestamp", "timestamp_ntz",
}


def jar_path() -> str | None:
    """Path of the built writer jar, or None when absent."""
    return JAR_PATH if os.path.exists(JAR_PATH) else None


def ensure_jar(build: bool = True) -> str | None:
    """Return the jar path, building it with javac when missing.

    Returns None when the jar is absent and cannot be built (no javac in
    the environment) — callers fall back to the Python sink.
    """
    if os.path.exists(JAR_PATH):
        return JAR_PATH
    if not build or shutil.which("javac") is None:
        return None
    try:
        subprocess.run(
            ["bash", os.path.join(_JVM_DIR, "build.sh")],
            check=True,
            capture_output=True,
            timeout=300,
        )
    except (subprocess.SubprocessError, OSError):
        return None
    return JAR_PATH if os.path.exists(JAR_PATH) else None


def supports_schema(schema) -> bool:
    """True when every field is a flat type the JVM writer encodes
    (primitives, string/binary, decimal ≤38, date/timestamp)."""
    for f in schema.fields:
        name = f.dataType.typeName()
        if name == "decimal":
            continue
        if name not in _SUPPORTED_TYPES:
            return False
    return True


def session_has_jar(spark) -> bool:
    """Best-effort: was the writer jar on this session's classpath at JVM
    start? (spark.jars is static — a running session cannot gain it.)"""
    try:
        jars = spark.conf.get("spark.jars", "") or ""
    except Exception:
        return False
    return "quiver-jvm-writer.jar" in jars
