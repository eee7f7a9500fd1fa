"""Bounded-backoff JAX backend initialization for benchmark drivers.

The TPU chip sits behind a device tunnel whose claim can be temporarily
unavailable (e.g. while a previous client's claim expires). JAX caches a
failed backend init for the life of the process, so the only reliable
retry is to probe from a *subprocess* until the device answers, then
initialize in the calling process. One wedge must not zero a round's
measurements: after the attempt budget the caller can fall back to the
CPU backend (explicitly marked) instead of exiting nonzero.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_PROBE = ("import jax; d = jax.devices(); "
          "print('PLATFORM', d[0].platform)")


def probe_once(timeout: float = 300.0):
    """Try backend init in a subprocess. Returns platform str or None.

    The probe is given a generous timeout: killing a client mid-claim
    can wedge the device for later processes, so we only give up on a
    probe after ``timeout`` seconds of silence.
    """
    try:
        out = subprocess.run(
            [sys.executable, '-c', _PROBE], capture_output=True,
            text=True, timeout=timeout, env=os.environ.copy())
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith('PLATFORM '):
            return line.split(' ', 1)[1].strip()
    return None


def wait_for_backend(delays=(0, 30, 60, 120, 240), probe_timeout=300.0,
                     fallback_cpu=True, log=None):
    """Block until a JAX backend is reachable; return its platform name.

    Probes in subprocesses with bounded backoff (``delays`` seconds of
    sleep before each attempt). On success the calling process has NOT
    initialized JAX yet — import jax and proceed; its own init will hit
    the now-healthy device. If every attempt fails and ``fallback_cpu``
    is set, forces ``JAX_PLATFORMS=cpu`` via jax.config so the caller
    still produces a (clearly CPU-marked) measurement; otherwise raises.
    """
    log = log or (lambda m: print(m, file=sys.stderr))
    for i, delay in enumerate(delays):
        if delay:
            log(f'# backend unavailable; retry {i}/{len(delays) - 1} '
                f'in {delay}s')
            time.sleep(delay)
        platform = probe_once(probe_timeout)
        if platform is not None:
            if i:
                log(f'# backend recovered on retry {i} ({platform})')
            return platform
    if not fallback_cpu:
        raise RuntimeError(
            f'JAX backend unreachable after {len(delays)} probes')
    log('# backend unreachable after all retries — falling back to CPU '
        '(measurement will be CPU-bound; not comparable to TPU numbers)')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    return 'cpu'
