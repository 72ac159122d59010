"""Global image descriptors for submap covisibility retrieval.

The reference uses a pretrained NetVLAD through the hloc submodule
(utils/descriptor.py:12-34) purely as a black-box embedding:
images [B,3,H,W] -> desc [B,D], consumed by a cosine top-k query
(scene/Frame.py:284-293). Pretrained weights are not available in this
environment (zero egress), so the default embedding is a fixed
(training-free) multi-scale color+gradient signature with the same
interface; it only needs to rank *revisited viewpoints* above unrelated
ones, which coarse photometric layout does well for RGB-D trajectories.
A learned embedding can be dropped in behind `ImageDescriptor`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


GRID = 8  # spatial pooling grid


@functools.partial(jax.jit, static_argnames=())
def describe_image(img: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, 3] (0..1) -> L2-normalized descriptor [D].

    Channels: GRIDxGRID average color (3), GRIDxGRID gradient energy (1)
    -> D = 8*8*4 = 256.
    """
    h, w, _ = img.shape
    gh, gw = h // GRID, w // GRID
    img = img[: gh * GRID, : gw * GRID]
    cells = img.reshape(GRID, gh, GRID, gw, 3)
    mean_color = cells.mean(axis=(1, 3))                     # [G, G, 3]

    gray = img.mean(-1)
    gx = jnp.abs(jnp.diff(gray, axis=1, prepend=gray[:, :1]))
    gy = jnp.abs(jnp.diff(gray, axis=0, prepend=gray[:1]))
    grad = (gx + gy).reshape(GRID, gh, GRID, gw).mean(axis=(1, 3))

    d = jnp.concatenate([mean_color.reshape(-1), grad.reshape(-1)])
    d = d - d.mean()
    return d / jnp.maximum(jnp.linalg.norm(d), 1e-8)


def describe_frames(imgs) -> jnp.ndarray:
    """Stack of images -> [B, D] (reference MyDesc.__call__)."""
    return jnp.stack([describe_image(im) for im in imgs])


def query_covisible(desc_matrix, query, k: int):
    """Cosine top-k over per-submap descriptor stacks — pure numpy.

    desc_matrix: [num_submaps, reps, D]; query: [reps, D]. Mirrors
    Localmaps.query_covisable (scene/Frame.py:284-293): per-submap max
    similarity over representative images, then top-k submap indices.

    Host-side on purpose: the matrix is host-resident, grows with the
    submap count (a device version re-dispatches eagerly per merge and
    each int() readback drains the whole device queue mid-merge), and is
    tiny (num_submaps x reps x 256 f32).
    """
    import numpy as np

    dm = np.asarray(desc_matrix)
    q = np.asarray(query)
    i = dm.shape[0]
    sims = np.einsum("ird,qd->irq", dm, q).reshape(i, -1)
    max_sims = sims.max(axis=1)
    k = min(k, i)
    idx = np.argsort(-max_sims, kind="stable")[:k]
    return [int(x) for x in idx]
