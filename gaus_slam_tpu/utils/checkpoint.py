"""Mid-run checkpoint / resume (orbax) — an addition over the reference,
which only saves end-of-run artifacts (scene/__init__.py:9-27).

Snapshot = the frontend's map + pose/velocity scalars + the backend's
global map + submap transforms; enough to resume a crashed run at the
last submap boundary.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_run_state(path: str, frontend, backend) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    state = {"frontend_map": frontend.map._asdict()}
    if backend is not None and backend.map is not None:
        state["backend_map"] = backend.map._asdict()
        state["transforms"] = {
            str(i): lm.transform._asdict()
            for i, lm in enumerate(backend.local_maps)
            if lm.transform is not None
        }
    ckptr.save(os.path.join(path, "arrays"), state, force=True)
    ckptr.wait_until_finished()
    meta = {
        "cur_lmid": frontend.cur_lmid,
        "vel": np.asarray(frontend.vel).tolist(),
        "avg_depth_l1": frontend.avg_depth_l1,
        "num_submaps": len(backend.local_maps) if backend else 0,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_run_state(path: str):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(path, "arrays"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta
