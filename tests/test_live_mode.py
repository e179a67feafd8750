"""Live-pipeline timing (round 4): run_live paces the frame loop on the
output clock and DROPS ticks whose deadline already passed (the
GstAggregator timeout/QoS analog, gstvfmetalcompositor.m:574-684).
Deterministic tests via injectable time/sleep."""

from __future__ import annotations

import numpy as np

from tpuvf.cli.launch import parse_pipeline


DESC = ("videotestsrc num-buffers=8 "
        "! video/x-raw,format=NV12,width=64,height=48,framerate=25/1 "
        "! vfmetalvideofilter contrast=1.2 ! appsink")


def _build():
    p = parse_pipeline(DESC)
    p.negotiate()
    p.build()
    return p


class FakeClock:
    """Time advances only via sleep (on-time runs) plus an optional cost
    added per time() poll (simulated slow processing)."""

    def __init__(self, cost_per_poll=0.0):
        self.t = 0.0
        self.cost = cost_per_poll
        self.sleeps = []

    def time(self):
        self.t += self.cost
        return self.t

    def sleep(self, dt):
        assert dt >= 0.0
        self.sleeps.append(dt)
        self.t += dt


def test_run_live_on_time_renders_everything():
    p = _build()
    clk = FakeClock()
    n = p.run_live(8, time_fn=clk.time, sleep_fn=clk.sleep)
    assert n == 8
    assert p.stats.frames_dropped == 0
    assert len(p.sinks[0].frames) == 8
    # paced: it slept up to each 40 ms deadline
    assert len(clk.sleeps) >= 7
    # output matches the offline run bitwise (same clock, same buffers)
    q = _build()
    q.run(8)
    for a, b in zip(p.sinks[0].frames, q.sinks[0].frames):
        pa = a if isinstance(a, dict) else {"m": a}
        pb = b if isinstance(b, dict) else {"m": b}
        for k in pa:
            np.testing.assert_array_equal(np.asarray(pa[k]),
                                          np.asarray(pb[k]))


def test_run_live_slow_processing_drops():
    p = _build()
    # every time() poll costs 60 ms -> well past the 40 ms frame period:
    # the pacer must drop ticks instead of falling behind
    clk = FakeClock(cost_per_poll=0.06)
    n = p.run_live(8, time_fn=clk.time, sleep_fn=clk.sleep)
    assert n + p.stats.frames_dropped == 8
    assert p.stats.frames_dropped > 0
    assert len(p.sinks[0].frames) == n
    assert "dropped" in p.stats.summary()


def test_latency_query():
    p = _build()
    lo, hi = p.latency()
    assert lo == 0.0
    assert abs(hi - 1.0 / 25.0) < 1e-9
