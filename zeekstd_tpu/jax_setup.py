"""Shared JAX initialization: persistent compilation cache + timing hooks.

The reference measures perf offline with Criterion (SURVEY §5); on TPU the
equivalent discipline is (a) a persistent compilation cache so benchmarks
measure steady-state rather than XLA compile time, and (b) cheap per-phase
wall timers to attribute where device pipelines spend time.

The cache directory defaults to ``.jax_cache`` next to the repo root and
can be overridden with ``ZEEKSTD_JAX_CACHE_DIR`` (set to ``off`` to
disable). Safe to call any number of times, from any thread, before or
after the backend initializes (the cache config only needs to precede the
first *compilation*).
"""

from __future__ import annotations

import os
import sys
import time

_configured = False


def ensure_cache() -> None:
    """Enable JAX's persistent compilation cache (idempotent)."""
    global _configured
    if _configured:
        return
    _configured = True
    cache_dir = os.environ.get("ZEEKSTD_JAX_CACHE_DIR")
    if cache_dir == "off":
        return
    plat = (
        os.environ.get("JAX_PLATFORM_NAME")
        or os.environ.get("JAX_PLATFORMS")
        or "dev"
    )
    try:
        # A config-forced platform (jax.config.update("jax_platforms", ...))
        # overrides the env vars — conftest and standalone CPU scripts use
        # it because the axon plugin ignores the env spelling. Reading the
        # config does NOT initialize any backend.
        import jax

        cfg = getattr(jax.config, "jax_platforms", None)
        if cfg:
            plat = cfg.split(",")[0]
    except Exception:
        pass
    if plat == "cpu" and not cache_dir:
        # CPU compiles are fast and XLA:CPU AOT cache entries warn loudly
        # about host-feature mismatches between processes; the cache only
        # pays for itself on the accelerator path.
        return
    if not cache_dir:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
            plat,
        )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_TIMING = os.environ.get("ZEEKSTD_TPU_TIMING") in ("1", "2")
_FENCE = os.environ.get("ZEEKSTD_TPU_TIMING") == "2"

# Phase wall times of the most recent timed run, keyed by phase name
# (seconds, accumulated across enters). bench.py resets this and reads it
# back so its accounting line is computed from the timers, never quoted.
phase_records: dict[str, float] = {}


def set_timing(mode: int) -> None:
    """Programmatically enable phase timing (0=off, 1=wall, 2=fenced)."""
    global _TIMING, _FENCE
    _TIMING = mode in (1, 2)
    _FENCE = mode == 2


class phase_timer:
    """``with phase_timer("parse"):`` prints the phase wall time to stderr
    when ZEEKSTD_TPU_TIMING=1; free otherwise.

    ZEEKSTD_TPU_TIMING=2 additionally *fences* device work at phase exit:
    pass the phase's output array(s) to ``fence(...)`` and a tiny scalar
    reduction is pulled to host before the timer stops (block_until_ready
    can return early through the axon tunnel, so only a pull fences
    reliably). This attributes async device execution to the phase that
    dispatched it — for profiling only, it serializes the pipeline."""

    __slots__ = ("name", "t0", "_arrs")

    def __init__(self, name: str):
        self.name = name
        self._arrs = ()

    def fence(self, *arrs):
        if _FENCE:
            self._arrs = arrs
        return self

    def __enter__(self):
        if _TIMING:
            self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        if _TIMING:
            if self._arrs and not any(exc):
                import numpy as _np

                for a in self._arrs:
                    try:
                        _np.asarray(a[..., :1])
                    except Exception:
                        pass
            dt = time.time() - self.t0
            phase_records[self.name] = phase_records.get(self.name, 0.0) + dt
            print(
                f"[tpu-timing] {self.name}: {dt:.3f}s",
                file=sys.stderr,
                flush=True,
            )
        return False
