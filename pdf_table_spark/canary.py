"""Load canary for benchmark runs on a shared box.

Sandbox noise is ONE-SIDED: background load and a previous JVM's
teardown only ever slow a run down, so (a) measure capability as
best-of-N, and (b) don't start a trial while the box is busy. The
canary is a single-thread hash rate; background activity depresses it
proportionally. Used by both the scaling bench and the headline bench
so the two report under the same discipline.
"""

from __future__ import annotations

import hashlib
import time

_PROBE_BEST = [0.0]


def cpu_probe(seconds: float = 0.6) -> float:
    """Single-thread hash rate (ops/sec)."""
    t0 = time.perf_counter()
    n, x = 0, b"x" * 1000
    while time.perf_counter() - t0 < seconds:
        hashlib.md5(x).digest()
        n += 1
    return n / seconds


def wait_quiet(max_wait: float = 120.0, threshold: float = 0.93) -> dict:
    """Block until the canary reads within ``threshold`` of the best
    rate seen this session (or ``max_wait`` expires). Returns
    {rate, ratio, waited} so callers can record the window quality."""
    waited = 0.0
    if not _PROBE_BEST[0]:
        # warm the baseline with spaced probes so the first wait isn't
        # self-referential (a bench started during a background burst
        # would otherwise adopt the depressed rate as 'best' and pass
        # every check trivially)
        for _ in range(3):
            _PROBE_BEST[0] = max(_PROBE_BEST[0], cpu_probe(0.3))
            time.sleep(0.5)
            waited += 0.8
    while True:
        rate = cpu_probe()
        _PROBE_BEST[0] = max(_PROBE_BEST[0], rate)
        ratio = rate / _PROBE_BEST[0] if _PROBE_BEST[0] else 1.0
        if ratio >= threshold or waited >= max_wait:
            return {"rate": round(rate), "ratio": round(ratio, 3),
                    "waited_sec": waited}
        time.sleep(10)
        waited += 10
