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

import logging
import os
import sys

from pyspark.sql import DataFrame

__all__ = ["input_bytes", "record_gate", "LAST_DECISIONS"]

# One stderr line per gated build (bytes seen + shape chosen) so a
# mis-sized derived frame shows up in bench output as a visibly wrong
# decision instead of as a silent slow path (VERDICT r10 #5). The
# logger gets its own stderr handler (no propagation) so the line
# appears regardless of the host app's root-logging config.
class _DynamicStderrHandler(logging.StreamHandler):
    """Resolve sys.stderr at EMIT time, not import time — so the gate
    line lands on whatever stderr the host has live (bench subprocess
    pipes, pytest capture) instead of a stream captured at import."""

    def __init__(self) -> None:
        super().__init__(sys.stderr)

    @property
    def stream(self):
        return sys.stderr

    @stream.setter
    def stream(self, value):  # StreamHandler.__init__ assigns; ignore
        pass


_LOG = logging.getLogger("spark_graft.sizing")
if not _LOG.handlers:
    _h = _DynamicStderrHandler()
    _h.setFormatter(logging.Formatter("%(name)s: %(message)s"))
    _LOG.addHandler(_h)
    _LOG.setLevel(logging.INFO)
    _LOG.propagate = False

# site -> (bytes_seen, shape_chosen): the latest decision per gated
# site, queryable by tests and by a post-run bench audit.
LAST_DECISIONS: dict[str, tuple[int | None, str]] = {}


def record_gate(site: str, bytes_seen: int | None, shape: str) -> None:
    """Expose a size-gate decision: remember it in ``LAST_DECISIONS``
    and emit one stderr log line. Call once per gated build."""
    LAST_DECISIONS[site] = (bytes_seen, shape)
    _LOG.info("gate %s: input_bytes=%s -> shape=%s", site, bytes_seen, shape)


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
