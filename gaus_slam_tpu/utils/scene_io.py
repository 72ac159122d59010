"""Scene checkpoint save/load (reference scene/__init__.py:9-45).

Artifacts: config.json + gaussians.ply + w2cs.npz.npy + gt_w2cs.npz.npy —
the format consumed by eval / NVS / video / viewer entrypoints.
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from .ply import read_gaussians_ply, write_gaussians_ply


def save_scene(config: dict, gm: G.GaussianMap, w2cs, gt_w2cs, path: str):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, default=lambda o: None)

    n = int(gm.n_active)
    write_gaussians_ply(
        os.path.join(path, "gaussians.ply"),
        np.asarray(gm.params.xyz[:n]),
        np.asarray(gm.params.log_scales[:n]),
        np.asarray(gm.params.quats[:n]),
        np.asarray(gm.params.opacity_logit[:n]),
        np.asarray(gm.params.rgb[:n]),
    )
    np.save(os.path.join(path, "w2cs.npz"), np.stack(w2cs))
    np.save(os.path.join(path, "gt_w2cs.npz"), np.stack(gt_w2cs))


def load_scene(path: str, quantum: int = 1 << 16):
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    raw = read_gaussians_ply(os.path.join(path, "gaussians.ply"))
    n = raw["xyz"].shape[0]
    cap = max(quantum, -(-int(n * 1.1) // quantum) * quantum)
    gm = G.empty_map(cap)
    new = G.Params(
        xyz=jnp.zeros((cap, 3)).at[:n].set(raw["xyz"]),
        log_scales=jnp.zeros((cap, 2)).at[:n].set(raw["log_scales"]),
        quats=jnp.zeros((cap, 4)).at[:, 0].set(1.0).at[:n].set(raw["quats"]),
        opacity_logit=jnp.zeros((cap, 1)).at[:n].set(raw["opacity_logit"]),
        rgb=jnp.zeros((cap, 3)).at[:n].set(raw["rgb"]),
    )
    gm = gm._replace(
        params=new,
        active=jnp.arange(cap) < n,
        n_active=jnp.int32(n),
    )
    w2cs = np.load(os.path.join(path, "w2cs.npz.npy"))
    gt_w2cs = np.load(os.path.join(path, "gt_w2cs.npz.npy"))
    return config, gm, w2cs, gt_w2cs
