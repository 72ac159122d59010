"""Per-gaussian preprocessing for the 3DGS (volumetric) ablation path.

The reference's ``method='3dgs'`` renders through an external CUDA 3DGS
rasterizer (the SplaTAM fork of diff-gaussian-rasterization; reference
render/render_3dgs.py:3-107, ablation A / scripts/splatam.py). On TPU we
do not need a second kernel family: the standard EWA-splatting alpha

    alpha(pix) = op * exp(-0.5 * d^T conic d),   d = pix - mean2D

is a quadratic form in the pixel, and the 2DGS compositor's ray-splat
density rho3d = sx^2 + sy^2 with the PIXEL-LINEAR map

    (sx, sy) = (U00*dx + U01*dy, U11*dy),   conic = U^T U  (Cholesky)

is exactly that quadratic form. So 3DGS mode = this preprocess + the
unchanged tile binner + the unchanged Pallas compositing kernels:

  * a0/a1/a2 encode U and mean2D with p_z == 1 (no perspective divide),
  * t_w = (0, 0, z_view) makes the per-pixel depth the constant
    camera-space z — matching the SplaTAM fork's second rasterization
    pass that composites (z, 1, z^2) as colors for depth/silhouette
    (render_3dgs.py:59-82); our kernel's D / alpha channels equal its
    depth / silhouette outputs with no second pass,
  * the low-pass branch is never taken: the +0.3 px EWA dilation bounds
    every conic eigenvalue by 1/0.3 < FILTER_INV_SQUARE, so
    rho3d <= rho2d for all pixels,
  * normal is zeroed (the reference returns zeros for normal/middepth/
    dist in 3dgs mode; the facade zeroes the other two).

Math follows the public 3DGS EWA projection (frustum cull z > 0.2,
t.x/t.z clamped to 1.3*tan(fov/2), cov2D = J W Sigma W^T J^T + 0.3 I,
cull on det <= 0, radius = ceil(3 sqrt(lambda_max))), as in the
reference's vendored kernels.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .camera import Camera, world_to_pix3
from .preprocess import PreprocResult
from .se3 import quat_to_rotmat


def scales_to_3d(scales2: jnp.ndarray, isotropic: bool) -> jnp.ndarray:
    """[N, 2] activated surfel scales -> [N, 3] volumetric scales.

    The reference tiles a single isotropic column to 3
    (Gaussians.get_render_params, scene/Gaussians.py:330-336). For the
    anisotropic ablation the surfel has no third axis; we use the
    geometric mean of the two tangent scales (documented deviation — the
    reference passes a [N, 2] tensor into a kernel reading vec3).
    """
    if isotropic:
        s = scales2[:, 0:1]
        return jnp.concatenate([s, s, s], axis=-1)
    s2 = jnp.sqrt(scales2[:, 0:1] * scales2[:, 1:2])
    return jnp.concatenate([scales2, s2], axis=-1)


def preprocess_3dgs(
    xyz: jnp.ndarray,        # [N, 3] world-space centers
    scales3: jnp.ndarray,    # [N, 3] activated scales
    quats: jnp.ndarray,      # [N, 4] (w,x,y,z)
    opacities: jnp.ndarray,  # [N] activated
    cam: Camera,
    active: jnp.ndarray | None = None,
) -> PreprocResult:
    opacities = opacities.reshape(-1)
    w2c = cam.w2c.astype(jnp.float32)
    Rw = w2c[:3, :3]

    p_view = xyz @ Rw.T + w2c[:3, 3]
    tz = p_view[..., 2]
    valid = tz > 0.2
    tz_safe = jnp.where(valid, tz, 1.0)

    # EWA projection of the 3D covariance
    R = quat_to_rotmat(quats)                       # [N, 3, 3]
    M = R * scales3[..., None, :]                   # columns scaled
    sigma = M @ jnp.swapaxes(M, -1, -2)             # [N, 3, 3]

    limx = 1.3 * cam.width / (2.0 * cam.fx)
    limy = 1.3 * cam.height / (2.0 * cam.fy)
    txz = jnp.clip(p_view[..., 0] / tz_safe, -limx, limx)
    tyz = jnp.clip(p_view[..., 1] / tz_safe, -limy, limy)
    inv_z = 1.0 / tz_safe
    # J = [[fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]]  (2x3)
    j00 = cam.fx * inv_z
    j11 = cam.fy * inv_z
    j02 = -cam.fx * txz * inv_z
    j12 = -cam.fy * tyz * inv_z
    J = jnp.stack([
        jnp.stack([j00, jnp.zeros_like(j00), j02], -1),
        jnp.stack([jnp.zeros_like(j00), j11, j12], -1),
    ], -2)                                           # [N, 2, 3]
    T = J @ Rw                                       # [N, 2, 3]
    cov2d = T @ sigma @ jnp.swapaxes(T, -1, -2)      # [N, 2, 2]
    a = cov2d[..., 0, 0] + 0.3
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1] + 0.3
    det = a * c - b * b
    valid = valid & (det > 0.0)
    det_safe = jnp.where(det > 0.0, det, 1.0)

    # conic = [[c, -b], [-b, a]] / det; factor conic = U^T U with
    # U = [[u00, u01], [0, u11]]:
    #   u00^2 = conic_xx, u00*u01 = conic_xy, u01^2 + u11^2 = conic_yy
    ca = c / det_safe
    cb = -b / det_safe
    cc = a / det_safe
    u00 = jnp.sqrt(jnp.maximum(ca, 1e-12))
    u01 = cb / u00
    u11 = jnp.sqrt(jnp.maximum(cc - u01 * u01, 1e-12))

    # mean2D in pixel coords (same ndc2pix convention as the compositor)
    Mpix = world_to_pix3(cam)
    hom = xyz @ Mpix[:, :3].T + Mpix[:, 3]
    zc = jnp.where(hom[..., 2] == 0.0, 1.0, hom[..., 2])
    mx = hom[..., 0] / zc
    my = hom[..., 1] / zc

    # pixel-linear intersection map encoding (sx, sy) = U (pix - mean2D)
    zeros = jnp.zeros_like(mx)
    ones = jnp.ones_like(mx)
    a0 = jnp.stack([u00, zeros, zeros], -1)
    a1 = jnp.stack([u01, u11, zeros], -1)
    a2 = jnp.stack([-(u00 * mx + u01 * my), -u11 * my, ones], -1)
    t_w = jnp.stack([zeros, zeros, tz], -1)          # constant ray depth

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    if active is not None:
        valid = valid & active

    return PreprocResult(
        valid=valid,
        t_u=jnp.zeros_like(a0), t_v=jnp.zeros_like(a0), t_w=t_w,
        a0=a0, a1=a1, a2=a2,
        normal=jnp.zeros_like(a0),
        center=jnp.stack([mx, my], -1),
        radius=lax.stop_gradient(radius),
        depth=tz, opacity=opacities,
    )
