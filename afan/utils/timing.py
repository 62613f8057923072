"""Host-fetch RTT measurement + chained-window step timing.

On the tunneled TPU runtime one host value fetch costs a round trip
(~35 ms measured); honest step timings chain the measured calls through
a data dependency and fetch ONE value per window, then subtract the RTT
from the window (ROADMAP.md methodology).

The RTT probe must fetch a FRESH Array every time: jax caches the host
value per Array object, so re-fetching a buffer that was already pulled
is a ~0.07 ms cache hit, not a transfer (round-5 code-review catch —
the first batch-scaling scripts probed a cached buffer and silently
subtracted ~0).
"""
from __future__ import annotations

import time
from typing import Callable


def measure_rtt(probes: int = 10) -> float:
    """Min host-fetch round trip, from `probes` first-fetches of fresh
    tiny Arrays (a jitted (8, 128) sum per probe; its compute and
    dispatch are negligible next to the tunnel round trip)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x.sum())
    x = jnp.ones((8, 128))
    float(f(x))  # compile + first transfer
    best = float("inf")
    for _ in range(probes):
        t0 = time.perf_counter()
        float(f(x))  # each call returns a NEW, never-fetched Array
        best = min(best, time.perf_counter() - t0)
    return best


def time_chained_windows(
    run_one: Callable[[], None],
    fetch: Callable[[], None],
    iters: int,
    windows: int = 3,
    rtt: float = 0.0,
) -> tuple[float, float]:
    """(min, median) per-iteration seconds across `windows` windows of
    `iters` chained calls each; `fetch()` must materialize one value
    that transitively depends on every call in the window (this is the
    sync — `block_until_ready` does not reliably await the dispatch
    queue on this runtime). `rtt` is subtracted from each window total.
    """
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            run_one()
        fetch()
        times.append((time.perf_counter() - t0 - rtt) / iters)
    times.sort()
    return times[0], times[len(times) // 2]
