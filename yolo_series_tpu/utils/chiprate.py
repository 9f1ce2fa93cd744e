"""Relay-robust steady-state throughput measurement.

On the dev box the TPU sits behind a tunnel whose dispatch round-trip
varies 25-47 ms within a session; a host-side dispatch loop therefore
measures the tunnel, not the chip (and `block_until_ready` does not
reliably block through the relay at all). `chip_rate` instead runs N
back-to-back executions on-device inside ONE dispatch (`lax.fori_loop`,
consecutive iterations chained through an int32 carry so XLA cannot CSE
or reorder them) and reports the SLOPE between an N-iter and a 2N-iter
run — the fixed dispatch+fetch tunnel cost cancels, leaving the
steady-state per-batch time a serving queue on a host-attached chip
would see. Replaces the reference's trtexec/`torch_utils.profile`
wall-clock loops (reference utils/torch_utils.py:110-153) for this
topology.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def chip_rate(fn, x, iters: int = 20, reps: int = 3, consts=()) -> float:
    """Steady-state seconds per `fn(x, *consts)` execution on the device.

    fn: traceable program whose result's first leaf is an integer-like
    per-image output (e.g. num_dets) — it feeds the carry chain.
    x: device-resident input batch (uint8 or any dtype supporting +1).
    consts: extra pytrees (e.g. params/state) passed through as jit
    ARGUMENTS. Closing large weight trees over the traced fn inlines
    them as literal HLO constants — a w6 program serializes to 280 MB
    that way and the dev relay's /remote_compile rejects it (HTTP 413);
    as arguments the same module is 0.2 MB.
    """

    @jax.jit
    def run_n(xin, n, *cs):
        def body(i, carry):
            xi = xin + (carry & 1).astype(xin.dtype)
            out = fn(xi, *cs)
            first = jax.tree_util.tree_leaves(out)[0]
            return carry + jnp.sum(first).astype(jnp.int32)

        return lax.fori_loop(0, n, body, jnp.int32(0))

    # one compile covers both trip counts (n is a dynamic scalar)
    _ = np.asarray(run_n(x, iters, *consts))
    _ = np.asarray(run_n(x, 2 * iters, *consts))

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(run_n(x, n, *consts))  # fetch bounds the run
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(2 * iters) - timed(iters)) / iters
