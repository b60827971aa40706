"""Process-scoped scratch directories for queries that materialize
intermediate files (schema-evolution generations, streaming micro-batch
slices, symlinked stream inputs).

Why not ``tempfile.mkdtemp`` at every call site: the gate and the bench
invoke the same queries repeatedly in long-lived processes and across many
processes; bare mkdtemp dirs are never reclaimed, so repeated runs
accumulate unbounded fixture copies under /tmp. Why not ``shutil.rmtree``
in a ``finally``: the callers return LAZY DataFrames that read these files
only when the driver later collects — eager deletion would pull the data
out from under the unexecuted plan.

The contract here: every scratch dir lives under one per-process root
(``streamsurfer_scratch_<pid>``) which is removed exactly once via
``atexit`` when the process exits. Within the process, dirs stay unique
(mkdtemp under the root) so concurrent/lazy plans never collide; across
processes, pids differ; across RUNS, nothing leaks because each process
sweeps its own root on the way out. A best-effort startup sweep also
removes roots left by dead pids (e.g. a SIGKILLed run that skipped
atexit).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _sweep_dead_roots(base: str) -> None:
    """Remove scratch roots whose owning pid no longer exists."""
    prefix = "streamsurfer_scratch_"
    try:
        entries = os.listdir(base)
    except OSError:
        return
    for name in entries:
        if not name.startswith(prefix):
            continue
        try:
            pid = int(name[len(prefix):])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # raises if the pid is gone
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        except OSError:
            pass  # pid exists but isn't ours (EPERM) — leave it alone


def _root() -> str:
    global _ROOT
    if _ROOT is None:
        base = tempfile.gettempdir()
        _sweep_dead_roots(base)
        _ROOT = os.path.join(base, f"streamsurfer_scratch_{os.getpid()}")
        os.makedirs(_ROOT, exist_ok=True)
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory reclaimed at process exit.

    Drop-in replacement for ``tempfile.mkdtemp(prefix=...)`` with a
    bounded lifetime: unique within the process (safe for lazy plans),
    swept by atexit, and dead-pid leftovers are collected on first use.
    """
    return tempfile.mkdtemp(prefix=prefix, dir=_root())
