"""utils/fetch.py — the relay-stall watchdog (deadline + retry).

PERF.md records a ~16-minute relay stall mid-run on the tunneled chip;
fetch_with_deadline is the executor-layer mitigation it recommends. These
tests drive the watchdog with an injected `_asarray` so a "stall" is an
event that never fires and a "transient failure" is a raised exception —
no TPU or timing flakiness involved (deadlines are 50 ms against multi-
second test timeouts).
"""
import threading
import time

import numpy as np
import pytest

from neuralrgbd_tpu.utils.fetch import fetch_with_deadline


def test_fast_path_returns_value():
    x = np.arange(12).reshape(3, 4)
    out = fetch_with_deadline(x, deadline_s=5.0, retries=2)
    np.testing.assert_array_equal(out, x)


def test_deadline_zero_bypasses_watchdog():
    calls = []

    def asarray(x):
        calls.append(threading.current_thread())
        return np.asarray(x)

    main = threading.current_thread()
    out = fetch_with_deadline([1, 2], deadline_s=0, _asarray=asarray)
    np.testing.assert_array_equal(out, [1, 2])
    assert calls == [main]          # inline, no watchdog thread


def test_stalled_first_attempt_recovers_via_retry():
    """Attempt 0 wedges forever (the 16-min-stall model); the re-issued
    attempt completes and its value is returned within the test budget."""
    n_calls = [0]
    release_never = threading.Event()
    logs = []

    def asarray(x):
        n_calls[0] += 1
        if n_calls[0] == 1:
            release_never.wait(timeout=30)   # wedged RPC (bounded for CI)
            return np.asarray(x) * -1        # poison: must not win
        return np.asarray(x)

    t0 = time.monotonic()
    out = fetch_with_deadline(np.ones(4), deadline_s=0.05, retries=2,
                              tag="t", log=logs.append, _asarray=asarray)
    np.testing.assert_array_equal(out, np.ones(4))
    assert n_calls[0] == 2                   # exactly one re-issue needed
    assert time.monotonic() - t0 < 10
    assert any("re-issuing" in m for m in logs)


def test_transient_retry_failure_does_not_kill_original():
    """A retry that fails fast must not propagate while the original
    attempt is still in flight and eventually succeeds."""
    barrier = threading.Event()
    n_calls = [0]

    def asarray(x):
        n_calls[0] += 1
        if n_calls[0] == 1:
            barrier.wait(timeout=30)         # slow but good original
            return np.asarray(x)
        raise RuntimeError("transient relay error")

    def release_soon():
        time.sleep(0.3)
        barrier.set()

    threading.Thread(target=release_soon, daemon=True).start()
    out = fetch_with_deadline(np.full(3, 7.0), deadline_s=0.05, retries=2,
                              log=lambda m: None, _asarray=asarray)
    np.testing.assert_array_equal(out, np.full(3, 7.0))


def test_all_attempts_fail_raises():
    def asarray(x):
        raise RuntimeError("relay down")

    with pytest.raises(RuntimeError, match="relay down"):
        fetch_with_deadline(np.ones(2), deadline_s=0.05, retries=1,
                            log=lambda m: None, _asarray=asarray)


def test_env_default_deadline(monkeypatch):
    monkeypatch.setenv("NRGBD_FETCH_DEADLINE_S", "0")
    calls = []

    def asarray(x):
        calls.append(threading.current_thread())
        return np.asarray(x)

    out = fetch_with_deadline([3.0], _asarray=asarray)
    np.testing.assert_array_equal(out, [3.0])
    assert calls == [threading.current_thread()]
