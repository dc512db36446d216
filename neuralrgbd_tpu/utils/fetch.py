"""Watchdog device->host fetches for stall-prone transports.

PERF.md ("Production loop at the deployment defaults") records a ~16-minute
relay/remote-executable stall mid-run on the tunneled chip that eventually
self-recovered, and recommends an RPC deadline + retry at the executor
layer. This module is that layer: `fetch_with_deadline` runs the blocking
host fetch (`np.asarray`) on a watchdog thread; if the deadline passes, a
fresh fetch of the SAME device buffer is issued — fetches are read-only,
so a duplicate in flight is benign and JAX keeps the buffer alive while
any attempt references it — and the first attempt to complete wins. Once
the retry budget is spent the caller waits indefinitely on every attempt
still in flight (losing the chunk would be worse than latency; the
observed stall did eventually complete).

The deadline defaults from `NRGBD_FETCH_DEADLINE_S` (seconds; 120 by
default — generous against the ~95 ms healthy chunk fetch, tiny against
the 16-minute pathology). `NRGBD_FETCH_DEADLINE_S=0` disables the
watchdog entirely (plain inline `np.asarray`).
"""
from __future__ import annotations

import os
import queue
import threading

import numpy as np

__all__ = ["fetch_with_deadline"]

DEFAULT_DEADLINE_ENV = "NRGBD_FETCH_DEADLINE_S"


def _resolve_deadline(deadline_s):
    if deadline_s is None:
        return float(os.environ.get(DEFAULT_DEADLINE_ENV, "120"))
    return float(deadline_s)


def fetch_with_deadline(x, deadline_s=None, retries=2, tag="fetch",
                        log=None, _asarray=np.asarray):
    """Fetch `x` to host with a stall watchdog.

    Semantics:
      - attempt 0 starts immediately; each time `deadline_s` elapses with
        no attempt finished, one more attempt is issued, up to `retries`
        re-issues;
      - the first attempt to finish with a value wins (duplicates are
        discarded when their threads eventually return);
      - an attempt that raises is only propagated once NO attempt is left
        in flight and the retry budget is spent — a transient failure on
        a retry must not kill a run whose original fetch would succeed;
      - `deadline_s <= 0` bypasses the watchdog (inline fetch).

    `_asarray` is injectable for tests.
    """
    deadline_s = _resolve_deadline(deadline_s)
    if deadline_s <= 0:
        return _asarray(x)
    log = log or (lambda msg: print(msg, flush=True))

    results: queue.Queue = queue.Queue()

    def attempt(i):
        try:
            results.put((i, _asarray(x), None))
        except BaseException as e:  # noqa: BLE001 — relayed to the caller
            results.put((i, None, e))

    def spawn(i):
        threading.Thread(target=attempt, args=(i,), daemon=True,
                         name=f"fetch-watchdog-{tag}-{i}").start()

    spawn(0)
    issued, failed = 1, 0
    last_exc = None
    while True:
        in_flight = issued - failed
        budget_left = issued <= retries
        # Block with the deadline while a re-issue could still help;
        # afterwards wait forever on whatever is in flight.
        timeout = deadline_s if budget_left else None
        try:
            _, value, exc = results.get(timeout=timeout)
        except queue.Empty:
            log(f"[fetch-watchdog] {tag}: no fetch completed in "
                f"{deadline_s:.0f}s ({in_flight} in flight); re-issuing "
                f"(attempt {issued + 1}/{retries + 1})")
            spawn(issued)
            issued += 1
            continue
        if exc is None:
            return value
        failed += 1
        last_exc = exc
        if failed < issued:      # other attempts still in flight
            continue
        if budget_left:          # all failed so far, budget remains
            log(f"[fetch-watchdog] {tag}: attempt failed ({exc!r}); "
                f"re-issuing (attempt {issued + 1}/{retries + 1})")
            spawn(issued)
            issued += 1
            continue
        raise last_exc
