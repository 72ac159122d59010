"""LPIPS(alex) in JAX, loading weights from a local file.

The reference uses the `lpips` pip package with downloaded AlexNet +
linear-head weights (utils/eval.py:300). This environment has no network
egress and no pretrained weights baked in, so LPIPS is reported as NaN
unless the user drops a weights file at $LPIPS_WEIGHTS (an .npz with the
AlexNet conv weights `conv{i}_w`, `conv{i}_b` and LPIPS linear heads
`lin{i}_w` exported from the torch package).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_ALEX_CFG = [
    # (out_ch, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips(path: str | None = None):
    path = path or os.environ.get("LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    w = np.load(path)

    def forward(x: np.ndarray, y: np.ndarray) -> jnp.ndarray:
        """x, y: [H, W, 3] in 0..1 -> LPIPS distance."""

        def feats(img):
            # NOTE: no [0,1] -> [-1,1] rescale. The reference feeds
            # clamp(img, 0, 1) into lpips with normalize=False
            # (utils/eval.py:409), so the scaling layer sees raw [0,1];
            # parity requires reproducing that quirk.
            h = (jnp.asarray(img, jnp.float32) - _SHIFT) / _SCALE
            h = h.transpose(2, 0, 1)[None]
            outs = []
            for i, (oc, k, s, p) in enumerate(_ALEX_CFG):
                h = jax.lax.conv_general_dilated(
                    h, jnp.asarray(w[f"conv{i}_w"]), (s, s),
                    [(p, p), (p, p)],
                ) + jnp.asarray(w[f"conv{i}_b"]).reshape(1, -1, 1, 1)
                h = jax.nn.relu(h)
                if i in (0, 1):
                    h = -jax.lax.reduce_window(
                        -h, jnp.inf, jax.lax.min, (1, 1, 3, 3),
                        (1, 1, 2, 2), "VALID",
                    )
                outs.append(h)
            return outs

        fx, fy = feats(x), feats(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            lin = jnp.asarray(w[f"lin{i}_w"]).reshape(1, -1, 1, 1)
            total = total + (d * lin).sum(axis=1).mean()
        return total

    return forward
