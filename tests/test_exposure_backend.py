"""Backend per-submap exposure optimization (reference
slam/Backend.py:106-124 + scene/Frame.py:250-257).

A brightness drift is injected into the submap's ground-truth images
(gt' = a * C + b with the map built from the TRUE colors C); the
backend's mapping tasks must step the submap ExposureState toward the
drift and the learned exposure must improve color PSNR over the raw
render. Runs on CPU interpret kernels at a small scale.
"""
import os
import queue
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DRIFT_GAIN = 0.8
DRIFT_BIAS = 0.05


def _setup(enable_exposure=True, exposure_start=0, num_ba_iters=25,
           freeze_map=False):
    import jax.numpy as jnp

    os.environ["SYN_H"] = "48"
    os.environ["SYN_W"] = "64"
    from gaus_slam_tpu.data.synthetic import SyntheticDataset
    from gaus_slam_tpu.models import gaussians as G
    from gaus_slam_tpu.models.frame import Frame
    from gaus_slam_tpu.models.submap import LocalMap
    from gaus_slam_tpu.slam.backend import Backend
    from gaus_slam_tpu.slam.init_map import initialize_map
    from gaus_slam_tpu.utils.config import load_config, probe_cameras

    config = load_config(
        os.path.join(os.path.dirname(__file__), "..",
                     "configs", "synthetic", "config.py"))
    config["render"]["enable_exposure"] = enable_exposure
    config["backend"]["exposure_start"] = exposure_start
    config["backend"]["num_ba_iters"] = num_ba_iters
    config["backend"]["random_process"] = False
    if freeze_map:
        # isolate the exposure path: with the map frozen, any PSNR
        # improvement on the drifted gt must come from the exposure
        # (live map lrs would let rgb absorb part of the drift)
        for k in config["gaussians"]["training_args"]:
            config["gaussians"]["training_args"][k] = 0.0

    ds = SyntheticDataset(height=48, width=64, num_frames=3)
    color0, depth0, intrinsics, c2w = ds[0]
    probe_cameras(config, color0, intrinsics)
    be = Backend(config, backend="interpret")

    color = jnp.asarray(np.asarray(color0, np.float32) / 255.0)
    depth = jnp.asarray(np.asarray(depth0)[..., 0]
                        if np.asarray(depth0).ndim == 3
                        else np.asarray(depth0))
    w2c = jnp.asarray(np.linalg.inv(np.asarray(c2w)), jnp.float32)

    # map initialized from the TRUE colors; submap gt images drifted
    gm = initialize_map(1 << 16, color, depth, w2c, be.sys.cam)
    drifted = jnp.clip(DRIFT_GAIN * color + DRIFT_BIAS, 0.0, 1.0)

    frames = []
    for i in range(3):
        f = Frame(time_idx=i, gt_color=drifted, gt_depth=depth,
                  gt_w2c=np.asarray(w2c), kfid=0, frame_type=0)
        f.est_w2c = np.asarray(w2c, np.float32)
        frames.append(f)
    lm = LocalMap.cut(0, frames, G.extract_params(gm),
                      num_frame_saved=2, n_active_host=int(gm.n_active))
    # cut rebases est_w2c by f0^-1; restore the absolute pose via ref2f0
    be.process_localmap(lm, multi_process=True)
    return be, lm, color, drifted, depth, w2c


def _color_psnr(be, w2c, target, depth):
    """Masked color PSNR of the current global map render vs target,
    with and without the submap's learned exposure composed in."""
    import jax.numpy as jnp

    from gaus_slam_tpu.ops.composite_ref import frame_to_tiles
    from gaus_slam_tpu.render import render_view

    s = be.sys
    out = render_view(be.map, s.cam.replace_w2c(w2c), s.opts)
    gt_tiled = frame_to_tiles(target, depth, s.opts.grid)
    mask = (gt_tiled[:, 3] > 1e-5)[:, None, :]

    def psnr(pred):
        mse = jnp.sum(((pred - gt_tiled[:, 0:3]) ** 2) * mask) \
            / jnp.maximum(jnp.sum(mask) * 1.0, 1.0)
        return float(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12)))

    raw = out[:, 0:3]
    lm = be.local_maps[0]
    if lm.exposure is not None:
        g, b = lm.exposure.gain, lm.exposure.bias
        exposed = g * raw + b
    else:
        exposed = raw
    return psnr(raw), psnr(exposed)


@pytest.mark.slow
def test_backend_exposure_moves_and_improves():
    be, lm, color, drifted, depth, w2c = _setup(num_ba_iters=60,
                                                freeze_map=True)
    assert lm.exposure is not None, "start_optimizer must create exposure"
    g0 = float(lm.exposure.gain)
    assert g0 == 1.0

    # drain the scheduled mapping tasks: enable_exposure forces the
    # sequential (non-fused) path, each step composes + steps exposure
    while not be.task_queue.empty():
        be.process()

    g1 = float(lm.exposure.gain)
    b1 = float(lm.exposure.bias)
    assert int(lm.exposure.step) > 0, "exposure optimizer never stepped"
    # drift gain 0.8 / bias 0.05: gain must move down, bias up
    assert g1 < g0 - 0.02, (g0, g1)
    assert b1 > 0.005, b1

    raw_psnr, exp_psnr = _color_psnr(be, w2c, drifted, depth)
    assert exp_psnr > raw_psnr + 1.0, (raw_psnr, exp_psnr)


@pytest.mark.slow
def test_backend_exposure_gate_and_tracking():
    """mapping_times <= exposure_start must NOT step the exposure
    (Backend.py:121-124), and the tracking/ba tasks must run with the
    composed exposure without error."""
    be, lm, *_ = _setup(exposure_start=10 ** 6, num_ba_iters=4)
    while not be.task_queue.empty():
        be.process()
    assert int(lm.exposure.step) == 0
    assert float(lm.exposure.gain) == 1.0

    # tracking applies the composed fixed exposure, steps only the pose
    st0 = int(lm.transform.step)
    be.tracking(0)
    assert int(lm.transform.step) == st0 + 1
    assert int(lm.exposure.step) == 0

    # the "ba" branch is reachable through process() (Backend.py:189-191)
    # and steps map + transform LR + exposure (no mapping_times gate)
    be.task_queue.put(("ba", 0))
    be.process()
    assert int(lm.transform.step) == st0 + 2
    assert int(lm.exposure.step) == 1


@pytest.mark.slow
def test_backend_exposure_gate_boundary():
    """The first exposure step lands on mapping call exposure_start + 1,
    matching the reference's increment-then-check (Backend.py:121-124
    increments mapping_times BEFORE testing > 120)."""
    K = 2
    be, lm, *_ = _setup(exposure_start=K, num_ba_iters=0)
    for call in range(1, K + 2):
        be.mapping(0)
        if call <= K:
            assert int(lm.exposure.step) == 0, (call, int(lm.exposure.step))
        else:
            assert int(lm.exposure.step) == 1, (call, int(lm.exposure.step))
    assert lm.mapping_times == K + 1


def test_frame_exposure_composition():
    """Composed exposure matches get_frame_exposure (Frame.py:250-257):
    A = lm_g * f_g, B = lm_g * f_b + lm_b."""
    import jax.numpy as jnp

    from gaus_slam_tpu.models.frame import Frame, init_exposure
    from gaus_slam_tpu.models.submap import LocalMap

    f = Frame(time_idx=0, gt_color=None, gt_depth=None,
              gt_w2c=np.eye(4, dtype=np.float32))
    f.est_exposure = (1.1, -0.03)
    lm = LocalMap(lmid=0, frames=[f], map_params=None)
    lm.exposure = init_exposure()._replace(gain=jnp.float32(0.9),
                                           bias=jnp.float32(0.02))
    fe = lm.frame_exp(0)
    a = float(lm.exposure.gain) * fe[0]
    b = float(lm.exposure.gain) * fe[1] + float(lm.exposure.bias)
    assert np.allclose(a, 0.9 * 1.1)
    assert np.allclose(b, 0.9 * -0.03 + 0.02)
