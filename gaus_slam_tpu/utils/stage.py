"""Host->device frame staging in native camera dtypes.

The device sits behind a ~25 MB/s host tunnel (~1 ms/dispatch, see
PERF.md); shipping a 340x600 frame as float32 costs ~3.3 MB (~130 ms of
tunnel time), 13 MB at the reference's 680x1200. Cameras don't produce
float32: color is uint8 and depth sensors emit uint16 (the reference's
own datasets store depth PNGs at Replica's 6553.5 counts/meter,
configs/data/replica.yaml png_depth_scale). Shipping those native
dtypes cuts the bytes ~3.6x; the frontend dequantizes on-device with
one fused VPU multiply (`Frontend.process_frame` dtype gate).

For integer-valued sources (every real dataset) the color path is
lossless. For the procedural synthetic scene it applies the same
quantization a real capture would (0.15 mm depth LSB, 1/255 color) —
both >=5x below the measured metric floors (depth-L1 ~5 mm).
"""
from __future__ import annotations

import numpy as np

# Replica's depth PNG convention: 6553.5 counts per meter -> 0.153 mm
# LSB, 10 m ceiling (reference configs/data/replica.yaml).
DEPTH_U16_SCALE = 6553.5
_DEPTH_MAX_M = 65535.0 / DEPTH_U16_SCALE


def pack_frame(color, depth):
    """Quantize one RGB-D frame to transfer dtypes.

    color: [H, W, 3] in 0..255 (any float/int dtype) -> uint8.
    depth: [H, W(,1)] meters -> uint16 at DEPTH_U16_SCALE, or float32
    unchanged when the scene exceeds the 10 m uint16 ceiling (the
    frontend accepts either dtype).
    """
    c8 = np.clip(np.round(np.asarray(color, np.float32)), 0, 255)
    c8 = c8.astype(np.uint8)
    d = np.asarray(depth, np.float32)
    if float(d.max(initial=0.0)) <= _DEPTH_MAX_M:
        d = np.round(d * np.float32(DEPTH_U16_SCALE)).astype(np.uint16)
    return c8, d
