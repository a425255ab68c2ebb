"""TPU-tunnel outage probe.

A hung axon tunnel blocks JAX backend initialization in a bare futex
sleep, and a process that has touched the hung backend cannot recover —
so the probe must run in a THROWAWAY subprocess, never in the caller.
This module is the single owner of the probe and its timeout, so the
observed cold-reconnect bound (~2 min on this tunnel) is calibrated in
one place instead of drifting between bench.py / __graft_entry__ /
chip-queue scripts (a 90 s copy of this logic once misclassified a
healthy-but-cold tunnel as hung).

Deliberately imports no jax: callers probe BEFORE deciding whether to
initialize their own backend.
"""

from __future__ import annotations

import subprocess
import sys
from typing import Optional, Tuple

# Cold tunnel reconnects of ~2 min have been observed; a healthy warm
# backend answers in seconds.
DEFAULT_TIMEOUT_S = 300.0

_PROBE_CODE = (
    "import jax; b = jax.default_backend(); "
    "t = 'tpu' if b == 'tpu' or 'TPU' in str(jax.devices()[0]) else 'cpu'; "
    "print(t, jax.device_count())"
)


def probe_backend(
    timeout_s: float = DEFAULT_TIMEOUT_S,
) -> Optional[Tuple[str, int]]:
    """Initialize the default backend in a throwaway subprocess.

    Returns ``(kind, device_count)`` with kind in {'tpu', 'cpu'}, or
    ``None`` when initialization hung (tunnel outage) or failed. The
    subprocess inherits the environment, so XLA_FLAGS device-count
    forcing is reflected in the count.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    out = proc.stdout.strip().splitlines()
    if proc.returncode != 0 or not out:
        return None
    try:
        kind, cnt = out[-1].split()
        return kind, int(cnt)
    except ValueError:
        return None
