"""Final evaluation pass (reference utils/eval.py:254-485).

Per-frame: render at the estimated pose, PSNR (valid-depth-masked),
MS-SSIM, LPIPS (NaN without local weights), depth RMSE/L1; trajectory
ATE-RMSE with Umeyama alignment. Writes result.json + per-frame txt
dumps. TSDF mesh evaluation (F-score) lives in utils/eval_mesh.py and is
gated by config['eval']['eval_mesh'].
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

import functools

import jax

from ..models import gaussians as G
from ..ops.composite_ref import tiles_to_image
from ..render import RenderOptions, render_view
from ..slam.loss import LossConfig, normalized_depth
from ..utils.config import SystemConfig
from .image_metrics import lpips, ms_ssim, psnr
from .trajectory import ate_rmse


@functools.partial(jax.jit, static_argnames=("opts", "lcfg", "want_img"))
def _eval_frame(gm, w2c, gt_color, gt_depth, cam_proj, opts, lcfg,
                want_img: bool):
    """One frame's render + metrics as a single compiled program — the
    host-driven per-op version pays ~1ms tunnel dispatch per op, which
    is minutes of pure dispatch on a 2000-frame trajectory."""
    out = render_view(gm, cam_proj.replace_w2c(w2c), opts)
    h, w = cam_proj.height, cam_proj.width
    img = tiles_to_image(
        jnp.concatenate(
            [out[:, 0:3], normalized_depth(out, lcfg)[:, None]], axis=1
        ),
        opts.grid, h, w,
    )
    rgb = jnp.clip(img[:3].transpose(1, 2, 0), 0.0, 1.0)
    rdepth = img[3]
    valid = gt_depth > 0
    p = psnr(rgb, gt_color, mask=valid)
    s = ms_ssim(rgb, gt_color)
    diff = jnp.where(valid, rdepth - gt_depth, 0.0)
    nv = jnp.maximum(jnp.sum(valid), 1)
    rmse = jnp.sqrt(jnp.sum(diff**2) / nv)
    l1 = jnp.sum(jnp.abs(diff)) / nv
    return (p, s, rmse, l1, rgb if want_img else None)


def eval_final(
    config: dict,
    gm: G.GaussianMap,
    w2cs,                 # list/array of estimated per-frame w2c
    gt_w2cs,
    dataset,              # indexable -> (color 0..255, depth, K, c2w)
    out_dir: str | None = None,
    backend: str = "pallas",
    stride: int = 1,
    save_renders: bool = False,
) -> dict:
    sys_cfg = SystemConfig.from_config(config, backend=backend)
    cam, opts, lcfg = sys_cfg.cam, sys_cfg.opts, sys_cfg.lcfg
    out_dir = out_dir or config.get("vis_base_dir", "output")
    os.makedirs(out_dir, exist_ok=True)

    ate = ate_rmse(w2cs, gt_w2cs)

    from .image_metrics import _lpips_model

    want_img = bool(save_renders) or _lpips_model() is not None
    psnrs, ssims, lpipss, rmses, l1s = [], [], [], [], []
    n = min(len(w2cs), len(dataset))
    pending = []  # (frame_idx, device tuple, gt_color np) — async pipeline

    def drain(entry):
        i, vals, gt_np = entry
        p, s, rmse, l1, rgb = jax.device_get(vals)
        psnrs.append(float(p))
        ssims.append(float(s))
        rmses.append(float(rmse))
        l1s.append(float(l1))
        if rgb is not None:
            lpipss.append(lpips(np.asarray(rgb), gt_np))
            if save_renders:
                rd = os.path.join(out_dir, "renders")
                os.makedirs(rd, exist_ok=True)
                np.save(os.path.join(rd, f"{i:05d}.npy"), np.asarray(rgb))
        else:
            lpipss.append(float("nan"))

    for i in range(0, n, stride):
        color, depth, _, _ = dataset[i]
        gt_np = np.asarray(color, np.float32) / 255.0
        gt_depth = np.asarray(depth, np.float32)
        if gt_depth.ndim == 3:
            gt_depth = gt_depth[..., 0]
        vals = _eval_frame(
            gm, jnp.asarray(w2cs[i], jnp.float32), jnp.asarray(gt_np),
            jnp.asarray(gt_depth), cam, opts, lcfg, want_img,
        )
        pending.append((i, vals, gt_np))
        if len(pending) > 3:  # keep a few frames in flight
            drain(pending.pop(0))
    for entry in pending:
        drain(entry)

    finite_lpips = [v for v in lpipss if np.isfinite(v)]
    result = {
        "PSNR": float(np.mean(psnrs)),
        "MS-SSIM": float(np.mean(ssims)),
        "LPIPS": float(np.mean(finite_lpips)) if finite_lpips
        else float("nan"),
        **({} if finite_lpips else {
            "lpips_note": "no weights found; export with "
            "tools/export_lpips_weights.py and set $LPIPS_WEIGHTS"}),
        "Depth RMSE": float(np.mean(rmses)),
        "Depth L1": float(np.mean(l1s)),
        "ATE RMSE": ate["rmse"],
        "ATE stats": ate,
        "num_gaussians": int(gm.n_active),
    }
    if config.get("eval", {}).get("eval_mesh", False):
        # TSDF-fuse the renders, score vs the gt mesh / unseen pointcloud
        # assets (or the depth-unprojection fallback) and emit
        # reconstruction_metrics.json (reference utils/eval.py:337-399,
        # 458-481 + eval_mesh.py:259-291)
        from .eval_mesh import evaluate_reconstruction, load_gt_mesh_assets

        ecfg = config["eval"]
        try:
            gt_mesh, unseen_pc, gt_points = load_gt_mesh_assets(
                config, dataset)
            mesh_metrics = evaluate_reconstruction(
                config, gm, w2cs, gt_points, out_dir=out_dir,
                backend=backend,
                mesh_interval=int(ecfg.get("mesh_interval", 5)),
                voxel_size=float(ecfg.get("voxel_size", 0.01)),
                gt_mesh=gt_mesh, unseen_pc=unseen_pc,
            )
            result["Mesh F-score"] = mesh_metrics.get("fscore")
            result["Mesh precision"] = mesh_metrics.get("precision")
            result["Mesh recall"] = mesh_metrics.get("recall")
        except Exception as e:  # noqa: BLE001 (ref wraps mesh eval in try)
            print(f"mesh evaluation failed: {e}")

    with open(os.path.join(out_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    for name, vals in (("psnr", psnrs), ("ssim", ssims), ("lpips", lpipss),
                       ("rmse", rmses), ("l1", l1s)):
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write("\n".join(str(v) for v in vals))
    return result
