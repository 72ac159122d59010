"""Edge-growth densification (reference slam/Densify.py:29-39): pixels
with partial alpha coverage and missing gt depth are unprojected from
the rendered depth — only when `use_edge_growth` is on."""
import jax.numpy as jnp
import numpy as np

from gaus_slam_tpu.models import gaussians as G
from gaus_slam_tpu.ops.binning import make_grid
from gaus_slam_tpu.ops.camera import Camera
from gaus_slam_tpu.ops.composite_ref import image_to_tiles
from gaus_slam_tpu.ops.compositing import OUT_C
from gaus_slam_tpu.render import RenderOptions
from gaus_slam_tpu.slam.densify import DensifyConfig, add_new_gaussians
from gaus_slam_tpu.slam.loss import LossConfig


def _setup():
    h = w = 32
    cam = Camera(h, w, 40.0, 40.0, 16.0, 16.0, jnp.eye(4))
    grid = make_grid(cam, 16, 16)
    opts = RenderOptions(grid=grid, backend="interpret")
    lcfg = LossConfig()

    rng = np.random.default_rng(0)
    gt_color = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    gt_depth = np.full((h, w), 2.0, np.float32)
    band = slice(12, 18)
    gt_depth[:, band] = 0.0            # sensor dropout band

    alpha = np.full((h, w), 0.95, np.float32)
    alpha[:, band] = 0.5               # partial coverage on the edge
    rdepth = np.full((h, w), 2.0, np.float32)
    # out_view rows: 3 = accumulated depth (D = alpha * depth under
    # weight norm), 4 = alpha
    img = np.zeros((OUT_C, h, w), np.float32)
    img[3] = alpha * rdepth
    img[4] = alpha
    out_view = image_to_tiles(jnp.asarray(img), grid)

    n_band = h * (band.stop - band.start)
    return cam, opts, lcfg, gt_color, jnp.asarray(gt_depth), out_view, n_band


def test_edge_growth_off_adds_nothing():
    cam, opts, lcfg, gt_color, gt_depth, out_view, _ = _setup()
    gm = G.empty_map(4096)
    dcfg = DensifyConfig(sil_thres=0.6, edge_thres=0.4, use_edge_growth=False)
    gm2 = add_new_gaussians(gm, jnp.eye(4), gt_color, gt_depth, out_view,
                            cam, opts, dcfg, lcfg)
    assert int(gm2.n_active) == 0


def test_edge_growth_adds_on_edges_only():
    cam, opts, lcfg, gt_color, gt_depth, out_view, n_band = _setup()
    gm = G.empty_map(4096)
    dcfg = DensifyConfig(sil_thres=0.6, edge_thres=0.4, use_edge_growth=True)
    gm2 = add_new_gaussians(gm, jnp.eye(4), gt_color, gt_depth, out_view,
                            cam, opts, dcfg, lcfg)
    n = int(gm2.n_active)
    assert n == n_band, (n, n_band)
    # grown gaussians sit at the rendered depth
    xyz = np.asarray(gm2.params.xyz[:n])
    np.testing.assert_allclose(xyz[:, 2], 2.0, rtol=1e-5)
    # and only at band pixel columns: x in the band's camera-plane range
    xs = xyz[:, 0] * 40.0 / 2.0 + 16.0   # back-project to pixel u
    assert xs.min() > 11.0 and xs.max() < 18.5


def test_edge_growth_requires_partial_alpha():
    cam, opts, lcfg, gt_color, gt_depth, out_view, _ = _setup()
    # raise edge_thres above the band alpha: nothing qualifies
    gm = G.empty_map(4096)
    dcfg = DensifyConfig(sil_thres=0.6, edge_thres=0.55, use_edge_growth=True)
    gm2 = add_new_gaussians(gm, jnp.eye(4), gt_color, gt_depth, out_view,
                            cam, opts, dcfg, lcfg)
    assert int(gm2.n_active) == 0
