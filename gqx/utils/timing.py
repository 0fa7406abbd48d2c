"""Reliable device timing on the tunneled platform.

``jax.block_until_ready`` can return before the device has executed on this
environment's tunneled TPU (measured: a 1 GB elementwise op "completes" in
0.06 ms without a fetch vs 3.4 ms with one).  The only reliable execution
barrier is a device->host value fetch; executions are in-order per device, so
fetching one scalar of the LAST output waits for everything queued before it.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def fetch_barrier(out) -> None:
    """Force execution of everything queued up to (and including) ``out``."""
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "ravel")]
    if not leaves:
        return
    x = leaves[0]
    np.asarray(jax.device_get(x.ravel()[:1] if x.size else x))


def timeit(fn, *args, n: int = 20, warmup: int = 2):
    """(seconds_per_call, last_output) with a true device barrier.

    The n calls are dispatched back-to-back (amortizing the ~35 ms tunnel
    round-trip) and the clock stops at a host fetch of the last output.
    """
    for _ in range(warmup):
        out = fn(*args)
    fetch_barrier(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    fetch_barrier(out)
    return (time.time() - t0) / n, out
