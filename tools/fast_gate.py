#!/usr/bin/env python
"""Sharded fast-gate runner: `pytest -m fast` split across N concurrent
pytest processes, one Spark session each.

Why this exists: the fast tier is ~350 tests whose wall clock is
dominated by per-test Spark job latency (~1.2 s median), not by a few
hot tests — single-process `pytest -m fast` measures ~8 min on the
32-core box, which a pre-commit gate cannot afford (r9 VERDICT task #3;
the container has no pytest-xdist and installs are off-limits). Sharding
by test FILE keeps every session-scoped fixture intact within its
process (each worker gets its own SparkSession, warehouse, tmpdirs), and
`-m fast` inside each worker still applies the conftest tiering, so the
selected test set is IDENTICAL to single-process `pytest -m fast`.

Workers get local[cpus/N] Spark sessions and a bounded driver heap so N
JVMs fit the box. Files are balanced across shards greedy-by-size
(on-disk bytes track test weight well enough). Exit code is non-zero iff
any shard fails; each shard's tail is replayed on failure.

Usage:
    python tools/fast_gate.py          # 4 shards (default)
    python tools/fast_gate.py 6        # 6 shards

Single-process `pytest -m fast` remains the canonical fallback — this
runner only changes scheduling, never selection.
"""

from __future__ import annotations

import heapq
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TESTS = REPO / "tests"
sys.path.insert(0, str(REPO))

# The single source of truth is tests/conftest.py; a private copy here
# could drift in the dangerous direction (a module re-tiered fast in
# conftest but still skipped by the gate's file pre-filter — silently
# narrower selection than `pytest -m fast` while claiming parity).
from tests.conftest import _SLOW_MODULES  # noqa: E402


def shard_files(n: int) -> list[list[Path]]:
    files = sorted(
        p for p in TESTS.glob("test_*.py") if p.stem not in _SLOW_MODULES
    )
    # greedy longest-processing-time: biggest file to the lightest shard
    heap = [(0, i) for i in range(n)]
    heapq.heapify(heap)
    shards: list[list[Path]] = [[] for _ in range(n)]
    for f in sorted(files, key=lambda p: p.stat().st_size, reverse=True):
        load, i = heapq.heappop(heap)
        shards[i].append(f)
        heapq.heappush(heap, (load + f.stat().st_size, i))
    return [s for s in shards if s]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = max(2, (os.cpu_count() or 8) // n)
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
    )
    t0 = time.time()
    procs = []
    for i, shard in enumerate(shard_files(n)):
        log = tempfile.NamedTemporaryFile(
            mode="w+", prefix=f"fastgate{i}_", suffix=".log", delete=False
        )
        procs.append(
            (
                i,
                log,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-m", "fast", "-q", "-p",
                     "no:cacheprovider", *map(str, shard)],
                    cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
                ),
            )
        )
    rc = 0
    for i, log, p in procs:
        code = p.wait()
        log.flush()
        log.close()
        tail = Path(log.name).read_text().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"shard {i}: exit {code} — {summary}", flush=True)
        if code not in (0, 5):  # 5 = no tests collected in this shard
            rc = 1
            print("\n".join(tail[-40:]), flush=True)
            print(f"shard {i} full log kept: {log.name}", flush=True)
        else:
            # an every-commit gate must not leak one temp log per shard
            Path(log.name).unlink(missing_ok=True)
    print(f"fast gate: {'PASS' if rc == 0 else 'FAIL'} in {time.time()-t0:.0f}s")
    return rc


if __name__ == "__main__":
    sys.exit(main())
