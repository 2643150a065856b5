"""Differentiable 3DGS math primitives (pure jnp, fully batched).

Semantics follow the reference kernels (tiled_shaders.metal:91-304) but the
implementation is vectorized over all Gaussians at once so XLA maps it onto the
VPU; there is no per-Gaussian control flow, only masks.

Conventions:
  * quaternions are (w, x, y, z), active rotation, same as the reference
    (tiled_shaders.metal:91-99 stores w in .x).
  * matrices are row-major; ``R @ v`` rotates the column vector v.
  * all functions take/return float32 arrays with a leading batch axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z) -> rotation matrix, batched [..., 4] -> [..., 3, 3].

    Matches tiled_shaders.metal:91-99 (Metal builds columns; row-major here).
    Does NOT normalize; callers normalize first where the reference does.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def normalize_quat(q: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Normalize quaternion; fall back to identity if degenerate
    (tiled_shaders.metal:173-175 uses length > 0.001)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    identity = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(norm > eps, q / jnp.maximum(norm, eps), identity)


def clamp_scale_aspect(scale: jnp.ndarray, max_aspect: float = 20.0) -> jnp.ndarray:
    """Clamp the max/min scale aspect ratio to ``max_aspect``
    (tiled_shaders.metal:163-170): if max > 20*min, rescale so max == 20*min."""
    max_s = jnp.max(scale, axis=-1, keepdims=True)
    min_s = jnp.min(scale, axis=-1, keepdims=True)
    target_max = max_aspect * min_s
    factor = jnp.where(max_s > target_max, target_max / max_s, 1.0)
    return scale * factor


def covariance_3d(scale: jnp.ndarray, q_normed: jnp.ndarray) -> jnp.ndarray:
    """Sigma3D = M @ M^T with M = R @ S (tiled_shaders.metal:176-190).

    scale: [..., 3] linear (already exp'ed + aspect-clamped) scales.
    q_normed: [..., 4] normalized quaternion (w,x,y,z).
    Returns [..., 3, 3].
    """
    R = quat_to_rotmat(q_normed)
    M = R * scale[..., None, :]  # R @ diag(scale): scales columns of R
    return M @ jnp.swapaxes(M, -1, -2)


def ewa_project(
    cov3d: jnp.ndarray,
    view_pos: jnp.ndarray,
    view_rot: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    jacobian_clamp: float = 1.3,
    lowpass: float = 0.3,
) -> jnp.ndarray:
    """EWA splatting: project 3D covariance to a 2D screen covariance.

    cov2D = (J W) Sigma3D (J W)^T with the reference's frustum clamps on the
    Jacobian (tiled_shaders.metal:193-225) and the +lowpass on the diagonal
    (tiled_shaders.metal:233-234).

    cov3d:    [..., 3, 3]
    view_pos: [..., 3] camera-space position (z > 0 in front).
    view_rot: [3, 3] world-to-view rotation (shared across batch).
    fx, fy:   scalar focal lengths in pixels.
    Returns [..., 3] packed (a, b, c) for [[a, b], [b, c]].
    """
    z = view_pos[..., 2]
    limx = jacobian_clamp * fx / z
    limy = jacobian_clamp * fy / z
    txtz = jnp.clip(view_pos[..., 0] / z, -limx, limx)
    tytz = jnp.clip(view_pos[..., 1] / z, -limy, limy)

    j00 = fx / z
    j02 = -fx * txtz / z
    j11 = fy / z
    j12 = -fy * tytz / z

    # T = J @ W, rows of J are [j00, 0, j02] and [0, j11, j12]; third row zero,
    # so only the top-left 2x2 of cov2D is nonzero -- compute it directly.
    # T2 [.., 2, 3] = the two meaningful rows of J @ W.
    w0, w1, w2 = view_rot[0], view_rot[1], view_rot[2]
    t_row0 = j00[..., None] * w0 + j02[..., None] * w2  # [..., 3]
    t_row1 = j11[..., None] * w1 + j12[..., None] * w2  # [..., 3]

    # cov2d_ij = t_row_i @ cov3d @ t_row_j
    c_r0 = jnp.einsum("...i,...ij->...j", t_row0, cov3d)
    c_r1 = jnp.einsum("...i,...ij->...j", t_row1, cov3d)
    a = jnp.einsum("...j,...j->...", c_r0, t_row0) + lowpass
    b = jnp.einsum("...j,...j->...", c_r0, t_row1)
    c = jnp.einsum("...j,...j->...", c_r1, t_row1) + lowpass
    return jnp.stack([a, b, c], axis=-1)


def conic_from_cov2d(cov2d: jnp.ndarray, min_det: float = 1e-4):
    """Invert the 2x2 covariance into a conic (tiled_shaders.metal:239-248).

    Returns (conic [..., 3], det [..., ], valid mask [...]).
    Invalid (det < min_det) conics are zeroed like the reference leaves them.
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    valid = det >= min_det
    inv_det = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)
    return conic, det, valid


def radius_from_cov2d(cov2d: jnp.ndarray, max_radius: float = 512.0) -> jnp.ndarray:
    """3-sigma screen radius from the max eigenvalue (tiled_shaders.metal:250-255):
    ceil(3*sqrt(lambda_1)) capped at max_radius."""
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    mid = 0.5 * (a + c)
    disc = mid * mid - det
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, disc))
    return jnp.minimum(jnp.ceil(3.0 * jnp.sqrt(lam1)), max_radius)


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))


SH_C0 = 0.28209479177387814  # tiled_shaders.metal:83


def sh_dc_to_rgb(sh_dc: jnp.ndarray) -> jnp.ndarray:
    """DC spherical-harmonic coefficients -> clamped RGB
    (tiled_shaders.metal:297-301): clamp(SH_C0 * dc + 0.5, 0, 1)."""
    return jnp.clip(SH_C0 * sh_dc + 0.5, 0.0, 1.0)


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of sh_dc_to_rgb for initialization (main.mm:158-161)."""
    return (rgb - 0.5) / SH_C0


SH_C1 = 0.4886025119029199


def sh_eval(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate SH color up to ``degree`` (0 or 1) along view directions.

    sh: [N, 4, 3] (coeff, channel), coeff 0 = DC, coeffs 1..3 = degree-1
    (the ordering the 3DGS PLY schema stores as f_rest, ply_loader.hpp:14-20).
    dirs: [N, 3] unit view directions (gaussian - camera).

    degree 0 reproduces the reference exactly — its evalSH ignores the
    direction and uses only the DC term (shaders.metal:58-61), even though the
    PLY loader reads the degree-1 coefficients.  degree 1 is the standard
    3DGS band-1 basis (-y, +z, -x), an extension the reference never wired up;
    unlike the reference, gradients flow to all coefficients via autodiff.
    """
    rgb = SH_C0 * sh[..., 0, :] + 0.5
    if degree >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        rgb = rgb + SH_C1 * (-y * sh[..., 1, :] + z * sh[..., 2, :] - x * sh[..., 3, :])
    return jnp.clip(rgb, 0.0, 1.0)
