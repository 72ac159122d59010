"""Pair-budget escalation ladder (SystemConfig.maybe_escalate).

TPU-native replacement for the reference's dynamic binning-buffer resize
(rasterizer_impl.cu:283-291): static budgets that escalate monotonically
on overflow diagnostics. VERDICT round-1 item 7.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gaus_slam_tpu.utils.config import SystemConfig, load_config, probe_cameras

import numpy as np


def make_sys():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "synthetic", "config.py"))
    cfg["cameras"]["height"] = 48
    cfg["cameras"]["width"] = 64
    cfg["cameras"]["intrinsics"] = [[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]]
    return SystemConfig.from_config(cfg, backend="interpret")


def test_overflow_doubles_pair_budget():
    s = make_sys()
    f0 = s.opts.pair_budget_factor
    s2 = s.maybe_escalate(overflow=True, n_shrunk=0, n_active=1000)
    assert s2 is not None and s2.opts.pair_budget_factor == 2 * f0
    # monotone: repeated overflow keeps doubling up to the cap of 16
    cur = s2
    for _ in range(8):
        nxt = cur.maybe_escalate(overflow=True, n_shrunk=0, n_active=1000)
        if nxt is None:
            break
        assert nxt.opts.pair_budget_factor == 2 * cur.opts.pair_budget_factor
        cur = nxt
    assert cur.opts.pair_budget_factor >= 16


def test_shrink_escalates_dmax_ladder():
    s = make_sys()
    d0 = s.opts.max_tiles_per_gaussian
    # below the 2% threshold: no escalation
    assert s.maybe_escalate(overflow=False, n_shrunk=10, n_active=100000) \
        is None
    s2 = s.maybe_escalate(overflow=False, n_shrunk=5000, n_active=100000)
    assert s2 is not None
    assert s2.opts.max_tiles_per_gaussian > d0
    assert s2.opts.max_tiles_per_gaussian in SystemConfig.DMAX_LADDER


def test_quiet_diagnostics_no_op():
    s = make_sys()
    assert s.maybe_escalate(overflow=False, n_shrunk=0, n_active=100000) \
        is None


def test_capacity_floor_pins_bucket():
    """tpu.frontend_capacity / backend_capacity pin the map capacity so
    jitted-program shape buckets never flip mid-run (PERF.md round-2:
    every flip re-traces the whole program set)."""
    import queue

    from gaus_slam_tpu.slam.frontend import Frontend

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "synthetic", "config.py"))
    cfg["cameras"]["height"] = 48
    cfg["cameras"]["width"] = 64
    cfg["cameras"]["intrinsics"] = [[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]]
    cfg["tpu"]["frontend_capacity"] = 1 << 18
    fe = Frontend(cfg, queue.Queue(), backend="interpret")
    assert fe._capacity_for(10) == 1 << 18
    assert fe._capacity_for(200_000) == 1 << 18       # below floor: pinned
    assert fe._capacity_for(300_000) > (1 << 18)      # above floor: grows
