"""Persistent jit-compile cache setup.

Remote-compile runtimes take minutes per program signature; the persistent
cache turns every relaunch (watchdog recovery, bench re-run, test re-run)
from a half-hour recompile into sub-second cache hits.

Setting ``JAX_COMPILATION_CACHE_DIR`` inside the process is NOT enough on
hosts whose sitecustomize imports jax at interpreter start (the config
option latches the env var at jax-import time — verified on the tunneled
dev box: env-set caches wrote nothing, ``jax.config.update`` works). Entry
points therefore call :func:`enable_persistent_cache` after importing jax.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "~/.cache/fedicra_tpu/jax"


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``path``.

    Precedence: explicit arg > JAX_COMPILATION_CACHE_DIR env > the
    per-user default. Returns the directory used.
    """
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or \
        os.path.expanduser(DEFAULT_CACHE_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
