"""Mid-run checkpoint / resume — an addition over the reference, which
only saves end-of-run artifacts (scene/__init__.py:9-27).

A checkpoint is written at a submap boundary (right after the backend
drained the submap's task queue) and contains:

  * orbax arrays: the frontend's local map, the backend's global map,
    and every submap's optimizable rigid transform (Adam state incl.)
  * meta.json: host-side state — frame cursor, velocity model, loss EMA,
    dashboards series, and per-submap trajectory records (est/gt w2c of
    every frame) so evaluation works after resume.

Restore rebuilds the SLAM state at that boundary; the one documented
difference vs an uninterrupted run is that restored submaps drop their
retained keyframe images, so the backend's covis-mapping tasks skip
pre-checkpoint submaps (it keeps refining new ones).
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np


def _map_state(gm):
    return {
        "params": dict(gm.params._asdict()),
        "m": dict(gm.m._asdict()),
        "v": dict(gm.v._asdict()),
        "step": gm.step,
        "active": gm.active,
        "n_active": gm.n_active,
    }


def _map_from(d):
    from ..models import gaussians as G

    return G.GaussianMap(
        params=G.Params(**{k: jnp.asarray(v) for k, v in d["params"].items()}),
        m=G.Params(**{k: jnp.asarray(v) for k, v in d["m"].items()}),
        v=G.Params(**{k: jnp.asarray(v) for k, v in d["v"].items()}),
        step=jnp.asarray(d["step"]),
        active=jnp.asarray(d["active"]),
        n_active=jnp.asarray(d["n_active"]),
    )


def save_run_state(path: str, frontend, backend,
                   next_frame_idx: int) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    state = {"frontend_map": _map_state(frontend.map)}
    if backend is not None and backend.map is not None:
        state["backend_map"] = _map_state(backend.map)
        state["transforms"] = {
            str(i): dict(lm.transform._asdict())
            for i, lm in enumerate(backend.local_maps)
            if lm.transform is not None
        }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "arrays"), state, force=True)
    ckptr.wait_until_finished()

    lms = []
    for lm in (backend.local_maps if backend is not None else []):
        lms.append({
            "lmid": lm.lmid,
            "tracking_ok": bool(lm.tracking_ok),
            "mapping_times": int(lm.mapping_times),
            "ref2f0": np.asarray(lm.ref2f0).tolist(),
            "map_desc": np.asarray(lm.map_desc).tolist(),
            "frames": [{
                "time_idx": int(f.time_idx),
                "frame_type": int(f.frame_type),
                "kfid": int(f.kfid),
                "est_w2c": np.asarray(f.est_w2c).tolist(),
                "gt_w2c": np.asarray(f.gt_w2c).tolist(),
            } for f in lm.frames],
        })
    meta = {
        "next_frame_idx": int(next_frame_idx),
        "cur_lmid": int(frontend.cur_lmid),
        "vel": np.asarray(frontend.vel).tolist(),
        "avg_depth_l1": float(frontend.avg_depth_l1),
        "depth_l1_rec": [float(x) for x in frontend.depth_l1_rec],
        "numpts_rec": [int(x) for x in frontend.numpts_rec],
        "tracking_flag": bool(frontend.tracking_flag),
        "totalpts_rec": [int(x) for x in backend.totalpts_rec]
        if backend is not None else [],
        "ape_rec": [float(x) for x in getattr(backend, "ape_rec", [])]
        if backend is not None else [],
        "localmaps": lms,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore_run_state(path: str, frontend, backend, dataset) -> int:
    """Rebuild frontend/backend state from a checkpoint; returns the
    frame index to continue from."""
    import orbax.checkpoint as ocp

    from ..models.frame import Frame, PoseState
    from ..models.submap import LocalMap

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(path, "arrays"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    next_idx = int(meta["next_frame_idx"])
    frontend.map = _map_from(state["frontend_map"])
    frontend.cur_lmid = int(meta["cur_lmid"])
    frontend.vel = np.asarray(meta["vel"], np.float32)
    frontend.avg_depth_l1 = float(meta["avg_depth_l1"])
    frontend.depth_l1_rec = list(meta["depth_l1_rec"])
    frontend.numpts_rec = list(meta["numpts_rec"])
    frontend.tracking_flag = bool(meta["tracking_flag"])

    # the current submap's reference keyframe is the cut frame
    # (= next_idx - 1); its map state is already in frontend.map
    rkf_idx = next_idx - 1
    color, depth, _, c2w = dataset[rkf_idx]
    depth = np.asarray(depth)
    if depth.ndim == 3:
        depth = depth[..., 0]
    cur = Frame(time_idx=rkf_idx, gt_color=jnp.asarray(color) / 255.0,
                gt_depth=jnp.asarray(depth),
                gt_w2c=np.linalg.inv(np.asarray(c2w)),
                kfid=frontend.cur_lmid, frame_type=0)
    cur.start_optimizer(np.eye(4, dtype=np.float32),
                        frontend.sys.lcfg.enable_exposure)
    frontend.local_frames = [cur]

    if backend is not None and "backend_map" in state:
        backend.map = _map_from(state["backend_map"])
        backend.totalpts_rec = list(meta["totalpts_rec"])
        backend.ape_rec = list(meta["ape_rec"])
        for i, lmm in enumerate(meta["localmaps"]):
            frames = []
            for fm in lmm["frames"]:
                fr = Frame(time_idx=fm["time_idx"], gt_color=None,
                           gt_depth=None,
                           gt_w2c=np.asarray(fm["gt_w2c"], np.float32),
                           kfid=fm["kfid"], frame_type=fm["frame_type"])
                fr.est_w2c = np.asarray(fm["est_w2c"], np.float32)
                frames.append(fr)
            lm = LocalMap(lmid=lmm["lmid"], frames=frames, map_params=None,
                          tracking_ok=lmm["tracking_ok"],
                          saved_idxs=[],  # images dropped across resume
                          ref2f0=np.asarray(lmm["ref2f0"], np.float32))
            lm.mapping_times = int(lmm["mapping_times"])
            lm.map_desc = np.asarray(lmm["map_desc"], np.float32)
            tr = state["transforms"].get(str(i))
            if tr is not None:
                lm.transform = PoseState(**{
                    k: jnp.asarray(v) for k, v in dict(tr).items()})
            backend.local_maps.add_localmap(lm)
        backend.cur_lmid = len(backend.local_maps) - 1
    return next_idx
