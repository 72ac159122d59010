"""Post-prune coarse backend mapping (round-5 perf knob).

The r3 A/B measured ALL-coarse backend mapping catastrophic (PSNR 16):
merged donors enter opacity-capped at logit(0.01) (reference
Backend.py:226) and must re-opacify through pre-prune mapping coverage
before the scheduled prune reaps them. The knob therefore applies only
to mapping tasks enqueued AFTER the prune (plus the race-free first
submap and idle refinement). These tests pin the task routing; the
quality gate is the A/B row "cmapb3pp".
"""
import os
import queue
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _make_backend(stride=3):
    from gaus_slam_tpu.slam.backend import Backend
    from gaus_slam_tpu.utils.config import load_config

    os.environ["SYN_H"] = "48"
    os.environ["SYN_W"] = "64"
    config = load_config(
        os.path.join(os.path.dirname(__file__), "..",
                     "configs", "synthetic", "config.py"))
    config["tpu"]["backend_coarse_map_stride"] = stride
    config["backend"]["random_process"] = False
    config["cameras"]["height"] = 48
    config["cameras"]["width"] = 64
    config["cameras"]["intrinsics"] = [[40.0, 0, 32], [0, 40.0, 24],
                                       [0, 0, 1]]
    return Backend(config, backend="interpret")


def _submap(idx, n=3):
    import jax.numpy as jnp

    from gaus_slam_tpu.data.synthetic import SyntheticDataset
    from gaus_slam_tpu.models import gaussians as G
    from gaus_slam_tpu.models.frame import Frame
    from gaus_slam_tpu.models.submap import LocalMap
    from gaus_slam_tpu.ops.camera import camera_from_intrinsics
    from gaus_slam_tpu.slam.init_map import initialize_map

    ds = SyntheticDataset(height=48, width=64, num_frames=10)
    color0, depth0, intrinsics, c2w = ds[3 * idx]
    cam = camera_from_intrinsics(48, 64, intrinsics, np.eye(4))
    color = jnp.asarray(np.asarray(color0, np.float32) / 255.0)
    depth = jnp.asarray(np.asarray(depth0))
    w2c = jnp.asarray(np.linalg.inv(np.asarray(c2w)), jnp.float32)
    gm = initialize_map(1 << 16, color, depth, w2c, cam)
    frames = []
    for i in range(n):
        f = Frame(time_idx=3 * idx + i, gt_color=color, gt_depth=depth,
                  gt_w2c=np.asarray(w2c), kfid=idx, frame_type=0)
        f.est_w2c = np.asarray(w2c, np.float32)
        frames.append(f)
    return LocalMap.cut(idx, frames, G.extract_params(gm),
                        num_frame_saved=2, n_active_host=int(gm.n_active))


def test_schedule_routes_coarse_post_prune_only():
    be = _make_backend(stride=3)
    be.process_localmap(_submap(0), multi_process=True)
    # first submap: donors enter at full opacity, no prune scheduled ->
    # every mapping task is coarse-ok
    tasks0 = list(be.task_queue.queue)
    assert all(t[0] == "mapping" and t[2] for t in tasks0)
    while not be.task_queue.empty():
        be.process()

    be.process_localmap(_submap(1), multi_process=True)
    tasks = list(be.task_queue.queue)
    kinds = [t[0] for t in tasks]
    prune_at = kinds.index("prune")
    pre = [t for t in tasks[:prune_at] if t[0] == "mapping"]
    post = [t for t in tasks[prune_at + 1:] if t[0] == "mapping"]
    assert pre and post
    # pre-prune mapping must stay DENSE (re-opacification race)
    assert all(t[2] is False for t in pre)
    assert all(t[2] is True for t in post)


def test_drain_batches_by_coarse_class(monkeypatch):
    """The 4-task fuser must not mix dense and coarse tasks in one
    batch (they run different programs), and must pass the right
    stride through."""
    be = _make_backend(stride=2)
    be.process_localmap(_submap(0), multi_process=True)
    while not be.task_queue.empty():
        be.process()

    calls = []
    orig = be.mapping_batch

    def spy(idxs, coarse=False):
        calls.append((len(idxs), coarse))
        return orig(idxs, coarse=coarse)

    monkeypatch.setattr(be, "mapping_batch", spy)
    # hand-craft a mixed run: 4 dense then 4 coarse
    for _ in range(4):
        be.task_queue.put(("mapping", 0, False))
    for _ in range(4):
        be.task_queue.put(("mapping", 0, True))
    while not be.task_queue.empty():
        be.process()
    assert (4, False) in calls and (4, True) in calls
    # phase carry advances only for coarse batches
    assert be._map_phase == 4 % 4


def test_legacy_two_tuple_mapping_task_is_dense(monkeypatch):
    be = _make_backend(stride=2)
    be.process_localmap(_submap(0), multi_process=True)
    while not be.task_queue.empty():
        be.process()
    calls = []
    orig = be.mapping_batch

    def spy(idxs, coarse=False):
        calls.append((len(idxs), coarse))
        return orig(idxs, coarse=coarse)

    monkeypatch.setattr(be, "mapping_batch", spy)
    for _ in range(4):
        be.task_queue.put(("mapping", 0))  # external producer, no flag
    while not be.task_queue.empty():
        be.process()
    assert calls == [(4, False)]


def test_pre_stride_rotates_independently(monkeypatch):
    """backend_coarse_pre_stride drives the PRE-prune (dense-class)
    batches with its own phase counter; the post-prune counter is
    untouched."""
    from gaus_slam_tpu.slam.backend import Backend
    from gaus_slam_tpu.utils.config import load_config

    os.environ["SYN_H"] = "48"
    os.environ["SYN_W"] = "64"
    config = load_config(
        os.path.join(os.path.dirname(__file__), "..",
                     "configs", "synthetic", "config.py"))
    config["tpu"]["backend_coarse_map_stride"] = 3
    config["tpu"]["backend_coarse_pre_stride"] = 2
    config["backend"]["random_process"] = False
    config["cameras"]["height"] = 48
    config["cameras"]["width"] = 64
    config["cameras"]["intrinsics"] = [[40.0, 0, 32], [0, 40.0, 24],
                                       [0, 0, 1]]
    be = Backend(config, backend="interpret")
    be.process_localmap(_submap(0), multi_process=True)
    while not be.task_queue.empty():
        be.process()
    p_post0, p_pre0 = be._map_phase, be._map_phase_pre
    for _ in range(4):
        be.task_queue.put(("mapping", 0, False))   # pre-prune class
    while not be.task_queue.empty():
        be.process()
    assert be._map_phase_pre == (p_pre0 + 4) % 4
    assert be._map_phase == p_post0  # post counter untouched
