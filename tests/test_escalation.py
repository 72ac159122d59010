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
    assert s2 is not None and s2.opts.pair_budget_factor == round(1.5 * f0, 3)
    # monotone: repeated overflow keeps doubling up to the cap of 16
    cur = s2
    for _ in range(8):
        nxt = cur.maybe_escalate(overflow=True, n_shrunk=0, n_active=1000)
        if nxt is None:
            break
        assert nxt.opts.pair_budget_factor == round(1.5 * cur.opts.pair_budget_factor, 3)
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


def test_fold_diags_keeps_midloop_overflow():
    """A transient overflow in the middle of a loop survives the fold
    (round-2 weak #3: only the last iteration's aux was read)."""
    import jax.numpy as jnp

    from gaus_slam_tpu.slam.steps import fold_diags

    diags = [
        {"overflow": jnp.bool_(False), "n_shrunk": jnp.int32(0)},
        {"overflow": jnp.bool_(True), "n_shrunk": jnp.int32(7)},   # mid
        {"overflow": jnp.bool_(False), "n_shrunk": jnp.int32(2)},  # last
    ]
    out = fold_diags(diags)
    assert bool(out["overflow"])
    assert int(out["n_shrunk"]) == 7


def test_frontend_mapping_escalates_on_midloop_overflow(monkeypatch):
    """Overflow on a NON-final mapping iteration still escalates the
    pair budget (frontend folds diagnostics across the whole loop)."""
    import queue

    import jax.numpy as jnp

    from gaus_slam_tpu.models import gaussians as G
    from gaus_slam_tpu.slam import frontend as FE
    from gaus_slam_tpu.slam.init_map import initialize_map

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "synthetic", "config.py"))
    cfg["cameras"]["height"] = 48
    cfg["cameras"]["width"] = 64
    cfg["cameras"]["intrinsics"] = [[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]]
    cfg["frontend"]["num_mapping_iters"] = 4
    # force the per-step host loop (the fused mapping_loop accumulates
    # in-program and is covered by the companion test below)
    cfg["frontend"]["additional_densify"] = False
    cfg["tpu"]["mapping_rebin_every"] = 3  # 4 % 3 != 0 -> legacy path
    fe = FE.Frontend(cfg, queue.Queue(), backend="interpret")

    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 3, (48, 64)), jnp.float32)

    class F:
        gt_color, gt_depth = color, depth
        exposure = None
        mapping_times = 0
        get_w2c = np.eye(4, dtype=np.float32)
        gt_tiled = None

    fe.map = initialize_map(4096, color, depth,
                            jnp.eye(4, dtype=jnp.float32), fe.sys.cam)

    calls = {"n": 0}

    def fake_mapping_step(gm, w2c, gt, exp, do_exp, sched, cam, opts,
                          mcfg, lcfg, bins=None):
        calls["n"] += 1
        ov = calls["n"] == 2  # overflow ONLY on the 2nd of 4 iterations
        return gm, exp, {"overflow": jnp.bool_(ov),
                         "n_shrunk": jnp.int32(0),
                         "loss": jnp.float32(0.0)}

    monkeypatch.setattr(FE, "mapping_step", fake_mapping_step)
    f0 = fe.sys.opts.pair_budget_factor
    fe.mapping(frames=[F()])
    assert calls["n"] == 4
    assert fe.sys.opts.pair_budget_factor == round(1.5 * f0, 3)


def test_backend_mesh_path_escalates(monkeypatch):
    """mapping_group's sharded-BA diagnostics reach the ladder (round-2
    weak #3: the mesh path discarded aux entirely)."""
    import jax.numpy as jnp

    from gaus_slam_tpu import parallel as par
    from gaus_slam_tpu.models import gaussians as G
    from gaus_slam_tpu.slam.backend import Backend
    from gaus_slam_tpu.slam.init_map import initialize_map
    from gaus_slam_tpu.models.frame import Frame
    from gaus_slam_tpu.models.submap import LocalMap
    from gaus_slam_tpu.parallel import make_mesh
    import random as _random

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "synthetic", "config.py"))
    cfg["cameras"]["height"] = 48
    cfg["cameras"]["width"] = 64
    cfg["cameras"]["intrinsics"] = [[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]]
    be = Backend(cfg, backend="interpret", mesh=make_mesh(8))

    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 3, (48, 64)), jnp.float32)
    frames = []
    for t in range(2):  # 1-frame submaps retain nothing (frames[:-1])
        fr = Frame(time_idx=t, gt_color=color, gt_depth=depth,
                   gt_w2c=np.eye(4, dtype=np.float32), kfid=0)
        fr.start_optimizer(np.eye(4, dtype=np.float32),
                           enable_exposure=False)
        frames.append(fr)
    gm = initialize_map(4096, color, depth, jnp.eye(4, dtype=jnp.float32),
                        be.sys.cam)
    lm = LocalMap.cut(0, frames, G.extract_params(gm), 1,
                      rng=_random.Random(0))
    lm.start_optimizer(np.eye(4, dtype=np.float32))
    be.local_maps.add_localmap(lm)
    be.map = gm

    def fake_sharded(mesh, gm_, w2cs, gts, cam, opts, mcfg, lcfg,
                     weights=None):
        return gm_, jnp.float32(0.0), {"overflow": jnp.bool_(True),
                                       "n_shrunk": jnp.int32(0)}

    monkeypatch.setattr(par, "sharded_ba_step", fake_sharded)
    f0 = be.sys.opts.pair_budget_factor
    be.mapping_group([0])
    be._check_escalation()
    assert be.sys.opts.pair_budget_factor == round(1.5 * f0, 3)


def test_frontend_fused_mapping_escalates(monkeypatch):
    """The fused mapping_loop path folds overflow in-program; the
    frontend still escalates from its aux."""
    import queue

    import jax.numpy as jnp

    from gaus_slam_tpu.slam import frontend as FE
    from gaus_slam_tpu.slam.init_map import initialize_map

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "synthetic", "config.py"))
    cfg["cameras"]["height"] = 48
    cfg["cameras"]["width"] = 64
    cfg["cameras"]["intrinsics"] = [[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]]
    cfg["frontend"]["num_mapping_iters"] = 4
    cfg["tpu"]["mapping_rebin_every"] = 2  # 4 % 2 == 0 -> fused path
    fe = FE.Frontend(cfg, queue.Queue(), backend="interpret")

    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 3, (48, 64)), jnp.float32)

    class F:
        gt_color, gt_depth = color, depth
        exposure = None
        mapping_times = 0
        get_w2c = np.eye(4, dtype=np.float32)
        gt_tiled = None

    fe.map = initialize_map(4096, color, depth,
                            jnp.eye(4, dtype=jnp.float32), fe.sys.cam)

    def fake_mapping_loop(gm, w2cs, gts, cam, opts, mcfg, lcfg,
                          rebin_every=1, coarse_stride=1):
        return gm, {"overflow": jnp.bool_(True), "n_shrunk": jnp.int32(0),
                    "loss": jnp.float32(0.0)}

    monkeypatch.setattr(FE, "mapping_loop", fake_mapping_loop)
    f0 = fe.sys.opts.pair_budget_factor
    fe.mapping(frames=[F()])
    assert fe.sys.opts.pair_budget_factor == round(1.5 * f0, 3)


def test_demand_driven_escalation_sizes_exactly():
    """With the binning's true pair demand in the diagnostics, one
    escalation jumps directly to demand * 1.15 (rounded up to 1/8
    steps) instead of walking blind 1.5x steps — a fullres overflow at
    demand/capacity = 1.59 lands on 1.875, not 2.025+."""
    s = make_sys()
    f0 = s.opts.pair_budget_factor  # 1.75 (synthetic default)
    cap = 1_000_000
    s2 = s.maybe_escalate(overflow=True, n_shrunk=0, n_active=cap,
                          demand=int(1.59 * cap))
    assert s2 is not None
    # 1.59 * 1.15 = 1.8285 -> ceil to 1/8 = 1.875
    assert s2.opts.pair_budget_factor == 1.875
    # monotone: a demand BELOW the current budget still escalates at
    # least one 1.125 step (the overflow was real; phase-block overflows
    # report with a global demand that fits)
    s3 = s.maybe_escalate(overflow=True, n_shrunk=0, n_active=cap,
                          demand=int(0.5 * cap))
    assert s3 is not None
    assert s3.opts.pair_budget_factor == round(f0 * 1.125, 3)
    # no demand signal: legacy 1.5x step
    s4 = s.maybe_escalate(overflow=True, n_shrunk=0, n_active=cap)
    assert s4.opts.pair_budget_factor == round(f0 * 1.5, 3)


def test_merge_horizon_policy():
    """Backend._merge_horizon: predictive capacity headroom (pure host).

    TPU-native replacement for the reference's per-frame dynamic buffer
    resize (rasterizer_impl.cu:283-291) at the MAP level: buckets must
    flip rarely (each flip re-traces the backend program set), so a
    merge that flips anyway jumps to the bucket covering the predicted
    next `capacity_horizon` merges. Policy pinned here:
      - no data / horizon disabled -> 0;
      - first flip (donor + one real peak): min(delta, need/4) — the
        donor->peak delta is structurally large, so the quarter-need
        cap binds on it, while flat growth pays ~nothing;
      - >=3 real peaks: horizon * median(recent deltas), capped at 3/4
        of the current need so extrapolation can't tax the run.
    """
    from gaus_slam_tpu.slam.backend import Backend

    class Stub:
        def __init__(self, hist, horizon=4):
            self._peak_hist = list(hist)
            self.capacity_horizon = horizon

    mh = Backend._merge_horizon

    # no history / single entry / horizon disabled
    assert mh(Stub([])) == 0
    assert mh(Stub([1_000_000])) == 0
    assert mh(Stub([100, 200, 300], horizon=0)) == 0

    # first flip: donor jump is large -> quarter-need cap binds
    assert mh(Stub([1_160_000, 2_350_000])) == 2_350_000 // 4
    # first flip, flat growth -> no headroom
    assert mh(Stub([1000, 1000])) == 0
    # first flip, small real delta below the cap -> the delta itself
    assert mh(Stub([1000, 1100])) == 100

    # steady growth with >=3 real deltas: horizon * median delta
    assert mh(Stub([50, 100, 112, 124, 136])) == 4 * 12
    # 3/4-of-need cap binds under explosive growth
    assert mh(Stub([50, 100, 200, 400, 800])) == (3 * 800) // 4
    # declining peaks -> zero (deltas clamp at 0)
    assert mh(Stub([9999, 2350, 2250, 2200, 2150])) == 0


def test_config_validation_rejects_unlowerable_knobs():
    """Config-time rejection with actionable messages (advisor r4):
    bf16 cannot compile on the pallas backend (v5e Mosaic), and the
    pyramid cache's nested phase order exists for coarsest stride 2/4
    with nesting levels only — both previously died deep inside a
    kernel compile / jit trace."""
    import pytest

    def cfg():
        c = load_config(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "synthetic", "config.py"))
        c["cameras"]["height"] = 48
        c["cameras"]["width"] = 64
        c["cameras"]["intrinsics"] = [[40.0, 0, 32], [0, 40.0, 24],
                                      [0, 0, 1]]
        return c

    c = cfg()
    c["tpu"]["compute_dtype"] = "bf16"
    with pytest.raises(ValueError, match="bf16"):
        SystemConfig.from_config(c, backend="pallas")
    # interpret mode is the sanctioned bf16 path
    s = SystemConfig.from_config(c, backend="interpret")
    assert s.opts.compute_dtype == "bf16"

    c = cfg()
    c["frontend"]["coarse_levels"] = [(6, 8), (10, 2)]  # coarsest 8
    with pytest.raises(ValueError, match="stride"):
        SystemConfig.from_config(c, backend="interpret")

    c = cfg()
    c["frontend"]["coarse_levels"] = [(6, 4), (10, 3)]  # 3 !| 4
    with pytest.raises(ValueError, match="nest"):
        SystemConfig.from_config(c, backend="interpret")

    c = cfg()
    c["frontend"]["coarse_levels"] = [(6, 4), (10, 2)]  # valid pyramid
    s = SystemConfig.from_config(c, backend="interpret")
    assert s.track_front.levels() == ((6, 4), (10, 2))


def test_pair_cap_overrides_and_escalates_demand_sized():
    """Demand-keyed pair budget (tpu.backend_pair_cap): an explicit row
    cap replaces factor*capacity as r_max — the backend's capacity
    bucket is sized for the merge peak, but per-keyframe pair demand
    tracks what the camera sees (2-3x smaller at the fullres bench
    shape) and every per-pair op scales with r_max. Escalation raises
    the cap demand-sized in one re-trace."""
    import dataclasses
    s = make_sys()
    s = dataclasses.replace(s, opts=s.opts._replace(pair_cap=1 << 18))
    # the explicit cap wins regardless of capacity
    assert s.opts.r_max(10_000_000) == 1 << 18
    assert s.opts.r_max(1000) == 1 << 18
    # overflow with a demand signal: cap jumps to quantized demand*1.15
    demand = 900_000
    s2 = s.maybe_escalate(overflow=True, n_shrunk=0, n_active=4_000_000,
                          demand=demand)
    assert s2 is not None
    q = 1 << 17
    expect = -(-int(demand * 1.15) // q) * q
    assert s2.opts.pair_cap == expect
    assert s2.opts.r_max(4_000_000) == expect
    # factor untouched (the cap owns sizing while set)
    assert s2.opts.pair_budget_factor == s.opts.pair_budget_factor
    # overflow with no demand signal: one bounded 1.25x (quantized) step
    s3 = s.maybe_escalate(overflow=True, n_shrunk=0, n_active=4_000_000)
    assert s3 is not None and s3.opts.pair_cap > s.opts.pair_cap
    # monotone: always at least one quantum up
    assert s3.opts.pair_cap >= s.opts.pair_cap + q


def test_pair_cap_config_plumbing():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "synthetic", "config.py"))
    cfg["cameras"]["height"] = 48
    cfg["cameras"]["width"] = 64
    cfg["cameras"]["intrinsics"] = [[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]]
    cfg["tpu"]["backend_pair_cap"] = 1 << 18
    sb = SystemConfig.from_config(cfg, backend="interpret")
    sf = SystemConfig.from_config(cfg, backend="interpret",
                                  component="frontend")
    assert sb.opts.pair_cap == 1 << 18
    assert sf.opts.pair_cap == 0  # frontend keyed separately
