"""Persistent XLA compilation cache for serving cold-start.

The Det serving graph takes minutes to compile per (batch, geometry)
shape — the first-deployment cost the reference never pays because torch
eager has none. JAX's persistent compilation cache turns every repeat
compile (process restarts, bench sweeps, serving rollouts on identical
topology) into a disk hit.

Call ``enable_compile_cache()`` early (before the first ``jit``
dispatch). Default location ``~/.cache/epropnp_tpu/xla``; override with
``EPROPNP_COMPILE_CACHE`` (set it to ``0``/``off`` to disable).
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None,
                         min_compile_secs: float = 5.0) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` and return it
    (None when disabled via EPROPNP_COMPILE_CACHE=0/off)."""
    env = os.environ.get('EPROPNP_COMPILE_CACHE', '')
    if env.lower() in ('0', 'off', 'false'):
        return None
    if path is None:
        path = env or os.path.expanduser('~/.cache/epropnp_tpu/xla')
    os.makedirs(path, exist_ok=True)
    import jax
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      min_compile_secs)
    # cache every entry regardless of backend (the axon tunnel backend
    # is not in the default allow-list)
    try:
        jax.config.update('jax_persistent_cache_enable_xla_caches',
                          'all')
    except Exception:  # older jax: flag absent
        pass
    return path
