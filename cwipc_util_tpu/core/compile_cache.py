"""Persistent XLA compilation cache, enabled for the whole framework.

The registration flows compile many mid-sized programs (the fused-ICP
loop per (capacity, variant) pair, normal estimation, the NN searches) and
on a relay-attached TPU each compile costs 40-70 s — the round-4 `cwipc
register` E2E measured 5m47s wall for 11.6 s of compute, all of it
compilation (VERDICT r4 weak #1).  JAX's persistent compilation cache
removes every repeat compile across processes; measured on the axon-relay
v5e (round 5, count-based): a cold process wrote 5 cache entries for a
jit program + a Pallas kernel, a second process reported 5
``/jax/compilation_cache/cache_hits`` events, zero new files, and the
compile+run times dropped 11.7 s -> 0.34 s (XLA) and 0.9 s -> 0.07 s
(Pallas).  Pallas programs ARE cacheable through the relay — the open
question from NOTES_ROUND4.md is settled.

The reference has no analog (its PCL/C++ path has no JIT; this cost class
is TPU-specific), so the policy is ours: enabled by default, under
``~/.cache/cwipc_util_tpu/jax`` (``XDG_CACHE_HOME`` respected), every
program cached regardless of compile time or size.  User configuration
wins: an explicit ``JAX_COMPILATION_CACHE_DIR`` (or an earlier
``jax.config.update``) is left untouched, and ``CWIPC_JAX_CACHE=0``
disables the whole feature.  ``CWIPC_JAX_CACHE_DIR`` overrides just the
location.
"""

from __future__ import annotations

import os
from typing import Optional


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "cwipc_util_tpu", "jax")


def enable_persistent_cache() -> Optional[str]:
    """Turn on the persistent compilation cache (idempotent).

    Returns the cache directory in effect, or None when disabled via
    ``CWIPC_JAX_CACHE=0``.
    """
    flag = os.environ.get("CWIPC_JAX_CACHE", "")
    if flag == "0":
        return None
    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        # jax is PRELOADED at interpreter startup in this image, so its
        # config snapshot of JAX_* env vars predates any user code: an
        # os.environ["JAX_COMPILATION_CACHE_DIR"] set in-process (as the
        # benchmark entry points do) never reaches jax.config by itself.
        # Honor it here so the documented precedence (explicit jax dir >
        # CWIPC_JAX_CACHE_DIR > default) holds either way.
        env_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if env_dir:
            cache_dir = env_dir
        # CPU-only processes skip the default-on cache (CWIPC_JAX_CACHE=1
        # or an explicit JAX_COMPILATION_CACHE_DIR still enables it): CPU
        # compiles are cheap, and XLA:CPU's AOT loader logs a loud
        # machine-feature warning for every cached executable it loads —
        # noise the 400-test suite and every CLI subprocess would emit.
        # The cache exists for the relay-attached TPU's 40-70 s compiles.
        elif flag != "1" and os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
            return None
        else:
            cache_dir = os.environ.get("CWIPC_JAX_CACHE_DIR") or default_cache_dir()
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache EVERYTHING: the register flow's program set is dozens of
    # small-to-mid programs, and through the relay even a trivial jit
    # costs seconds to compile.  Explicit env settings win — applied via
    # config.update because of the same preload gotcha as above.
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", 0.0)),
    )
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes",
        int(os.environ.get("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", -1)),
    )
    return cache_dir
