"""Mid-run checkpoint / resume — an addition over the reference, which
only saves end-of-run artifacts (scene/__init__.py:9-27).

A checkpoint is written at a submap boundary (right after the backend
drained the submap's task queue) and contains:

  * orbax arrays: the frontend's local map, the backend's global map,
    and every submap's optimizable rigid transform (Adam state incl.)
  * meta.json: host-side state — frame cursor, velocity model, loss EMA,
    dashboards series, and per-submap trajectory records (est/gt w2c of
    every frame) so evaluation works after resume.

Restore rebuilds the SLAM state at that boundary. Retained keyframe
images are NOT stored in the checkpoint — restore reloads them from the
dataset by ``time_idx`` (it gets the dataset), so restored submaps keep
their ``saved_idxs`` and the backend's covis-mapping/tracking tasks
continue to refine pre-checkpoint submaps exactly like an uninterrupted
run (r2 weak #6).
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
        exposures = {
            str(i): dict(lm.exposure._asdict())
            for i, lm in enumerate(backend.local_maps)
            if lm.exposure is not None
        }
        if exposures:
            state["exposures"] = exposures
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "arrays"), state, force=True)
    ckptr.wait_until_finished()

    lms = []
    for lm in (backend.local_maps if backend is not None else []):
        lms.append({
            "lmid": lm.lmid,
            "tracking_ok": bool(lm.tracking_ok),
            "mapping_times": int(lm.mapping_times),
            "saved_idxs": [int(i) for i in lm.saved_idxs],
            "ref2f0": np.asarray(lm.ref2f0).tolist(),
            "map_desc": np.asarray(lm.map_desc).tolist(),
            "frames": [{
                "time_idx": int(f.time_idx),
                "frame_type": int(f.frame_type),
                "kfid": int(f.kfid),
                "est_w2c": np.asarray(f.est_w2c).tolist(),
                "gt_w2c": np.asarray(f.gt_w2c).tolist(),
                "est_exposure": [float(x) for x in f.est_exposure],
            } for f in lm.frames],
        })
    meta = {
        "next_frame_idx": int(next_frame_idx),
        # the frontend's live (uncut) submap — the pipelined driver can
        # checkpoint mid-submap, several frames past the RKF
        "cur_frames": [{
            "time_idx": int(f.time_idx),
            "frame_type": int(f.frame_type),
            "kfid": int(f.kfid),
            "mapping_times": int(f.mapping_times),
            "w2c": np.asarray(f.get_w2c).tolist(),
        } for f in frontend.local_frames],
        "cur_lmid": int(frontend.cur_lmid),
        "vel": np.asarray(frontend.vel).tolist(),
        "avg_depth_l1": float(frontend.avg_depth_l1),
        "depth_l1_rec": [float(x) for x in frontend.depth_l1_rec],
        "numpts_rec": [int(x) for x in frontend.numpts_rec],
        "tracking_flag": bool(frontend.tracking_flag),
        "totalpts_rec": [int(x) for x in backend.totalpts_rec]
        if backend is not None else [],
        # merge-peak history: feeds _merge_horizon AND the never-shrink-
        # below-last-peak floor in _fit_capacity — without it the first
        # post-restore prune could shrink the bucket below the last merge
        # peak and re-trigger the re-trace oscillation (advisor r4)
        "peak_hist": [int(x) for x in getattr(backend, "_peak_hist", [])]
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
    frontend.n_active_host = int(frontend.map.n_active)
    frontend.cur_lmid = int(meta["cur_lmid"])
    frontend.vel = np.asarray(meta["vel"], np.float32)
    frontend.avg_depth_l1 = float(meta["avg_depth_l1"])
    frontend.depth_l1_rec = list(meta["depth_l1_rec"])
    frontend.numpts_rec = list(meta["numpts_rec"])
    frontend.tracking_flag = bool(meta["tracking_flag"])

    # rebuild the live (uncut) submap: every frame keeps its image until
    # the cut, so reload them all from the dataset by time_idx
    frontend.local_frames = []
    # .get: checkpoints written before cur_frames existed still restore
    # (they just start a fresh submap at the resume frame)
    for fm in meta.get("cur_frames", []):
        color, depth, _, c2w = dataset[fm["time_idx"]]
        depth = np.asarray(depth)
        if depth.ndim == 3:
            depth = depth[..., 0]
        fr = Frame(time_idx=fm["time_idx"],
                   gt_color=jnp.asarray(
                       np.asarray(color, np.float32) / np.float32(255)),
                   gt_depth=jnp.asarray(depth),
                   gt_w2c=np.linalg.inv(np.asarray(c2w)),
                   kfid=fm["kfid"], frame_type=fm["frame_type"])
        fr.est_w2c = np.asarray(fm["w2c"], np.float32)
        fr.mapping_times = int(fm["mapping_times"])
        frontend.local_frames.append(fr)
    # the last frame is "last" for the next process_frame's velocity
    # model; a fresh pose optimizer starts per frame, so est_w2c is
    # enough (checkpoints are only written between frames)
    if frontend.local_frames:
        frontend.local_frames[-1].start_optimizer(
            frontend.local_frames[-1].est_w2c,
            frontend.sys.lcfg.enable_exposure)

    if backend is not None and "backend_map" in state:
        backend.map = _map_from(state["backend_map"])
        backend.n_active_host = int(backend.map.n_active)
        backend.totalpts_rec = list(meta["totalpts_rec"])
        backend.ape_rec = list(meta["ape_rec"])
        # .get: checkpoints written before peak_hist existed restore with
        # an empty history (the horizon just re-learns growth)
        backend._peak_hist = [int(x) for x in meta.get("peak_hist", [])]
        for i, lmm in enumerate(meta["localmaps"]):
            saved_idxs = [int(x) for x in lmm.get("saved_idxs", [])]
            frames = []
            for fidx, fm in enumerate(lmm["frames"]):
                gt_color = gt_depth = None
                if fidx in saved_idxs:
                    # retained keyframes reload their images from the
                    # dataset so backend refinement keeps working on
                    # restored submaps (r2 weak #6)
                    color, depth, _, _ = dataset[fm["time_idx"]]
                    d = np.asarray(depth, np.float32)
                    if d.ndim == 3:
                        d = d[..., 0]
                    gt_color = jnp.asarray(
                        np.asarray(color, np.float32) / np.float32(255))
                    gt_depth = jnp.asarray(d)
                fr = Frame(time_idx=fm["time_idx"], gt_color=gt_color,
                           gt_depth=gt_depth,
                           gt_w2c=np.asarray(fm["gt_w2c"], np.float32),
                           kfid=fm["kfid"], frame_type=fm["frame_type"])
                fr.est_w2c = np.asarray(fm["est_w2c"], np.float32)
                fr.est_exposure = tuple(fm.get("est_exposure", (1.0, 0.0)))
                frames.append(fr)
            lm = LocalMap(lmid=lmm["lmid"], frames=frames, map_params=None,
                          tracking_ok=lmm["tracking_ok"],
                          saved_idxs=saved_idxs,
                          ref2f0=np.asarray(lmm["ref2f0"], np.float32))
            lm.mapping_times = int(lmm["mapping_times"])
            lm.map_desc = np.asarray(lmm["map_desc"], np.float32)
            tr = state["transforms"].get(str(i))
            if tr is not None:
                lm.transform = PoseState(**{
                    k: jnp.asarray(v) for k, v in dict(tr).items()})
            ex = state.get("exposures", {}).get(str(i)) \
                if "exposures" in state else None
            if ex is not None:
                from ..models.frame import ExposureState

                lm.exposure = ExposureState(**{
                    k: jnp.asarray(v) for k, v in dict(ex).items()})
            backend.local_maps.add_localmap(lm)
        backend.cur_lmid = len(backend.local_maps) - 1
    return next_idx
