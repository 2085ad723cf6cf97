"""Input-size metadata probes for scale-adaptive plan choices.

Some plan shapes have a SCALE-DEPENDENT winner: the same exact result
can come from a shape that is fastest when the input fits comfortably
in memory/page cache and from a different shape that is the only one
that survives a 10-100x scale-up (e.g. jaccard_pairs' shingle
checkpoint, quantile_bracket_audit's rank-selection path). The gates
decide from on-disk input file size — free Hadoop FS metadata, no job —
and every gated site documents its measured crossover A/B in
BASELINE.md so the threshold is evidence, not folklore.

Caveat shared by all callers: ``input_bytes`` sums the LEAF input files
of the frame, which equals the relevant corpus only when the frame is a
direct scan of its source table. For derived frames (multi-table joins,
heavy upstream filters) pass the decision explicitly instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["input_bytes"]


def input_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the frame's input files, via the JVM Hadoop
    FileSystem (metadata-only, works for any configured scheme — local,
    HDFS, object stores). None when unknowable (non-file source, FS
    error) — callers fall back to their small-input default."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        if all(f.startswith("file:") for f in files):
            # local scheme: stat directly, no py4j round-trip per file
            from urllib.parse import unquote, urlparse

            return sum(
                os.path.getsize(unquote(urlparse(f).path)) for f in files
            )
        jvm = df.sparkSession._jvm
        hconf = df.sparkSession._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            path = jvm.org.apache.hadoop.fs.Path(f)
            fs = path.getFileSystem(hconf)
            total += fs.getFileStatus(path).getLen()
        return total
    except Exception:  # noqa: BLE001 — sizing is best-effort, never fail a build
        return None
