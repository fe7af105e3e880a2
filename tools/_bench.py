"""Shared timing primitives for the TPU measurement tools.

ONE definition of the load-bearing methodology (see BASELINE.md and the
axon notes): the remote backend dispatches asynchronously and
``block_until_ready`` does not synchronize over the tunnel, so timings
must chain host-level data dependencies (each step consumes the previous
output) and end with a single scalar fetch as the fence. Tools previously
carried per-file copies of these helpers, which drifted.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def fence(tree):
    """Force the whole dependency chain by fetching one scalar."""
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def chain_time(step, *args, n_rep: int = 20):
    """Seconds per ``step`` application, measured over a host-chained run
    of ``n_rep`` applications (one warm call first). ``step``'s first
    positional argument is threaded through the chain; a tuple return
    threads its first element."""
    x = step(*args)
    fence(x)
    t0 = time.time()
    y = args[0]
    for _ in range(n_rep):
        y = step(y, *args[1:])
        if isinstance(y, tuple):
            y = y[0]
    fence(y)
    return (time.time() - t0) / n_rep
