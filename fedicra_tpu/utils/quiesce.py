"""Benchmark quiesce protocol for shared single-host/single-chip boxes.

Problem: the end-of-round benchmark (and the multi-chip dryrun) can start
while a watchdog-supervised training run owns the host core and the TPU —
the measurement then records contention, not the framework (observed:
0.318 img/s vs 1.38 clean). Two cooperating sides fix this without any
cross-process signalling or process-pattern matching:

- the measurement side enters :func:`quiesce` — it writes a sentinel file
  and waits (bounded) for the host load to drop;
- the supervisor side (tools/watchdog_train.py) polls
  :func:`quiesce_requested` — when the sentinel is fresh it kills its own
  child (freeing the chip + core), waits for the sentinel to clear, and
  relaunches with ``--resume`` (cheap: the persistent jit cache makes a
  relaunch start in seconds, and per-round snapshots lose at most one
  round of work).

The sentinel is considered stale after STALE_SEC (a crashed benchmark must
not stall training forever).
"""

from __future__ import annotations

import contextlib
import os
import time

SENTINEL = os.environ.get(
    "FEDICRA_QUIESCE_FILE", "/tmp/fedicra_quiesce_active"
)
STALE_SEC = 2 * 3600.0


def quiesce_requested() -> bool:
    """True when a fresh quiesce sentinel exists (supervisor side)."""
    try:
        return (time.time() - os.path.getmtime(SENTINEL)) < STALE_SEC
    except OSError:
        return False


def _load1() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:  # pragma: no cover
        return 0.0


@contextlib.contextmanager
def quiesce(max_wait: float = 360.0, quiet_load: float = 1.5):
    """Hold the sentinel for the duration of a measurement.

    Waits up to ``max_wait`` seconds for the 1-min load to fall under
    ``quiet_load`` (supervised trainers need ~1-2 poll cycles to notice
    and die). Proceeds regardless after the wait — the caller should
    record the load so a contended measurement is recognizable.
    """
    with open(SENTINEL, "w") as f:
        f.write(str(os.getpid()))
    try:
        deadline = time.time() + max_wait
        while _load1() >= quiet_load and time.time() < deadline:
            time.sleep(10.0)
            # keep the sentinel fresh for long waits
            os.utime(SENTINEL, None)
        yield
    finally:
        try:
            os.remove(SENTINEL)
        except OSError:
            pass
