"""Fused Pallas block-blend kernels (forward + transmittance-replay backward).

This is the TPU-native counterpart of the reference's tiledForward /
tiledBackward kernels (tiled_shaders.metal:307-385, 388-738).  The XLA
fallback in ops/rasterize.py materializes every [blocks, 256, B] intermediate
(power, alpha, transmittance, weights) in HBM; here each group of G blocks is
blended entirely in VMEM:

  * power    = feats [P2, 8] @ coef [8, B]          (MXU)
  * prefix   = log1m @ lower-triangular ones [B, B]  (MXU — the TPU-idiomatic
               in-block scan: a cumulative sum along lanes as one matmul)
  * c_b      = color [4, B] · weightsᵀ               (MXU)

and the backward replays the forward in VMEM (the reference's T-replay,
tiled_shaders.metal:429-514) and hand-derives d(coef), d(opacity), d(color):

  dL/dl_i = g_s + Σ_{j>i} e_j w_j      (reverse-exclusive suffix, upper-
                                        triangular matmul)
  dL/da_i = e_i T_i - dL/dl_i / (1-a_i)
  dL/dpow = dL/da · a                  (cap gradient passes through, matching
                                        the reference, which ignores the 0.99
                                        cap in backward)

Gradients to conic/mean flow through the (XLA, autodiff) coefficient
construction in ops/rasterize.py, so only the blend itself is hand-derived.
Accumulation across pixels is deterministic matmul reduction — no float
atomics (SURVEY.md §7.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# blocks blended per Pallas program (sublane-aligned for fp32 tiles)
GROUP = 8


def _tri_lower(b: int) -> jnp.ndarray:
    """L[j, i] = 1 if j <= i: x @ L = inclusive prefix sum along lanes."""
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return (r <= c).astype(jnp.float32)


def _tri_upper_strict(b: int) -> jnp.ndarray:
    """U[j, i] = 1 if j > i: x @ U = reverse-exclusive suffix sum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return (r > c).astype(jnp.float32)


def _replay(coef_i, op_i, feats, power_floor, alpha_cap, alpha_floor):
    """Shared forward math for one block: returns (power, a_raw, a, l)."""
    power = jnp.dot(feats, coef_i, preferred_element_type=jnp.float32)  # [P2,B]
    a_raw = op_i[None, :] * jnp.exp(power)
    mask = (power <= 0.0) & (power >= power_floor) & (a_raw >= alpha_floor)
    a = jnp.where(mask, jnp.minimum(a_raw, alpha_cap), 0.0)
    l = jnp.log1p(-a)
    return power, a_raw, a, l, mask


def _fwd_kernel(coef_ref, op_ref, col_ref, feats_ref, out_ref, *, cfg_consts):
    _, power_floor, alpha_cap, alpha_floor = cfg_consts
    feats = feats_ref[:]                      # [P2, 8]
    b = op_ref.shape[-1]
    tril = _tri_lower(b)
    for i in range(GROUP):
        _, _, a, l, _ = _replay(
            coef_ref[i], op_ref[i], feats, power_floor, alpha_cap, alpha_floor
        )
        cum_incl = jnp.dot(l, tril, preferred_element_type=jnp.float32)
        t = jnp.exp(cum_incl - l)             # exclusive prefix transmittance
        w = a * t                             # [P2, B]
        # c_b^T [4, P2]: contract over B; color row 3 is zero padding
        cbt = jax.lax.dot_general(
            col_ref[i], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_b = jnp.sum(l, axis=-1)             # [P2]
        row = jax.lax.broadcasted_iota(jnp.int32, cbt.shape, 0)
        out_ref[i] = jnp.where(row == 3, s_b[None, :], cbt)


def _bwd_kernel(coef_ref, op_ref, col_ref, feats_ref, g_ref,
                dcoef_ref, dop_ref, dcol_ref, *, cfg_consts):
    _, power_floor, alpha_cap, alpha_floor = cfg_consts
    feats = feats_ref[:]
    b = op_ref.shape[-1]
    tril = _tri_lower(b)
    triu = _tri_upper_strict(b)
    for i in range(GROUP):
        power, a_raw, a, l, mask = _replay(
            coef_ref[i], op_ref[i], feats, power_floor, alpha_cap, alpha_floor
        )
        cum_incl = jnp.dot(l, tril, preferred_element_type=jnp.float32)
        t = jnp.exp(cum_incl - l)
        w = a * t

        g = g_ref[i]                          # [4, P2]; rows 0-2 = dC, 3 = dS
        row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
        g_c = jnp.where(row == 3, 0.0, g)     # color rows only
        g_s = g[3, :]                         # [P2]

        # e[p, j] = sum_ch gC[ch, p] * col[ch, j]
        e = jax.lax.dot_general(
            g_c, col_ref[i], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                     # [P2, B]
        ew = e * w
        dl = jnp.dot(ew, triu, preferred_element_type=jnp.float32) + g_s[:, None]
        da = e * t - dl / (1.0 - a)
        dpow = jnp.where(mask, da * a_raw, 0.0)

        dcoef_ref[i] = jax.lax.dot_general(
            feats, dpow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                     # [8, B]
        dop_ref[i] = jnp.sum(jnp.where(mask, da * jnp.exp(power), 0.0), axis=0)
        dcol_ref[i] = jax.lax.dot_general(
            g_c, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                     # [4, B]


def _fwd_kernel_tf(coef_ref, op_ref, col_ref, feats_ref, logti_ref, out_ref,
                   *, cfg_consts):
    """T-floor forward: pairs whose incoming global transmittance is below
    the floor contribute nothing and stop updating T, matching the
    reference's per-pixel loop exit (tiled_shaders.metal:334).  The mask is
    exact because the unmasked prefix transmittance only decreases."""
    _, power_floor, alpha_cap, alpha_floor, log_thr = cfg_consts
    feats = feats_ref[:]
    b = op_ref.shape[-1]
    tril = _tri_lower(b)
    for i in range(GROUP):
        _, _, a, l, _ = _replay(
            coef_ref[i], op_ref[i], feats, power_floor, alpha_cap, alpha_floor
        )
        cum_incl = jnp.dot(l, tril, preferred_element_type=jnp.float32)
        log_excl = cum_incl - l
        # global exclusive transmittance; termination is monotone so the
        # mask needs no iteration
        mask_t = (log_excl + logti_ref[i][:, None]) > log_thr
        w = jnp.where(mask_t, a * jnp.exp(log_excl), 0.0)
        cbt = jax.lax.dot_general(
            col_ref[i], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_b = jnp.sum(jnp.where(mask_t, l, 0.0), axis=-1)  # frozen-T product
        row = jax.lax.broadcasted_iota(jnp.int32, cbt.shape, 0)
        out_ref[i] = jnp.where(row == 3, s_b[None, :], cbt)


def _bwd_kernel_tf(coef_ref, op_ref, col_ref, feats_ref, logti_ref, g_ref,
                   dcoef_ref, dop_ref, dcol_ref, *, cfg_consts):
    """T-floor replay backward: the termination mask is treated as a
    constant (the reference accumulates no gradients past lastContribIdx,
    tiled_shaders.metal:449-460)."""
    _, power_floor, alpha_cap, alpha_floor, log_thr = cfg_consts
    feats = feats_ref[:]
    b = op_ref.shape[-1]
    tril = _tri_lower(b)
    triu = _tri_upper_strict(b)
    for i in range(GROUP):
        power, a_raw, a, l, mask = _replay(
            coef_ref[i], op_ref[i], feats, power_floor, alpha_cap, alpha_floor
        )
        cum_incl = jnp.dot(l, tril, preferred_element_type=jnp.float32)
        mask_t = (cum_incl - l + logti_ref[i][:, None]) > log_thr
        # survivors' prefixes only contain survivors, so masking alpha
        # leaves their t/w unchanged while zeroing terminated pairs
        a = jnp.where(mask_t, a, 0.0)
        l = jnp.where(mask_t, l, 0.0)
        cum_incl = jnp.dot(l, tril, preferred_element_type=jnp.float32)
        t = jnp.exp(cum_incl - l)
        w = a * t

        g = g_ref[i]
        row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
        g_c = jnp.where(row == 3, 0.0, g)
        g_s = g[3, :]

        e = jax.lax.dot_general(
            g_c, col_ref[i], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ew = e * w
        # s_b only sums surviving pairs' log1m -> g_s reaches them alone
        dl = jnp.dot(ew, triu, preferred_element_type=jnp.float32) + jnp.where(
            mask_t, g_s[:, None], 0.0
        )
        da = e * t - dl / (1.0 - a)
        live = mask & mask_t
        dpow = jnp.where(live, da * a_raw, 0.0)

        dcoef_ref[i] = jax.lax.dot_general(
            feats, dpow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dop_ref[i] = jnp.sum(jnp.where(live, da * jnp.exp(power), 0.0), axis=0)
        dcol_ref[i] = jax.lax.dot_general(
            g_c, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _pad_groups(x, nb_pad):
    return jnp.pad(x, [(0, nb_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def block_blend_pallas(coef, opacity, color, cfg_consts):
    """coef [NB, 8, B] (6 quadratic-form rows + 2 zero), opacity [NB, B],
    color [NB, 4, B] (RGB + zero row).  cfg_consts is the static tuple
    (tile_size, power_floor, alpha_cap, alpha_floor).
    Returns out [NB, 4, P2]: rows 0-2 = blended color C_b, row 3 = S_b."""
    out, _ = _fwd(coef, opacity, color, cfg_consts)
    return out


def _pixel_feats8(tile_size: int) -> jnp.ndarray:
    """[tile_size^2, 8] monomials (x2, xy, y2, x, y, 1, 0, 0) of tile-local
    pixel centers (trace-time constant, mirrors rasterize._pixel_features)."""
    half = tile_size / 2.0
    coords = jnp.arange(tile_size, dtype=jnp.float32) + 0.5 - half
    y, x = jnp.meshgrid(coords, coords, indexing="ij")
    x = x.reshape(-1)
    y = y.reshape(-1)
    z = jnp.zeros_like(x)
    return jnp.stack([x * x, x * y, y * y, x, y, jnp.ones_like(x), z, z], axis=-1)


def _call(kernel, coef, opacity, color, extra_in, out_shapes, cfg_consts):
    nb, _, b = coef.shape
    feats = _pixel_feats8(int(cfg_consts[0]))
    p2 = feats.shape[0]
    nb_pad = -(-nb // GROUP) * GROUP
    coef = _pad_groups(coef, nb_pad)
    opacity = _pad_groups(opacity, nb_pad)
    color = _pad_groups(color, nb_pad)
    extra_in = [_pad_groups(x, nb_pad) for x in extra_in]

    grid = (nb_pad // GROUP,)
    def blk(shape):
        return pl.BlockSpec(
            (GROUP,) + shape,
            lambda g: (g,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
    in_specs = [
        blk((8, b)),
        blk((b,)),
        blk((4, b)),
        pl.BlockSpec((p2, 8), lambda g: (0, 0), memory_space=pltpu.VMEM),
    ] + [blk(x.shape[1:]) for x in extra_in]
    out_specs = tuple(blk(s[1:]) for s in out_shapes)
    outs = pl.pallas_call(
        functools.partial(kernel, cfg_consts=cfg_consts),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_shapes) > 1 else out_specs[0],
        out_shape=tuple(
            jax.ShapeDtypeStruct((nb_pad,) + s[1:], jnp.float32)
            for s in out_shapes
        )
        if len(out_shapes) > 1
        else jax.ShapeDtypeStruct((nb_pad,) + out_shapes[0][1:], jnp.float32),
        interpret=_interpret(),
    )(coef, opacity, color, feats, *extra_in)
    if len(out_shapes) == 1:
        return (outs[:nb],)
    return tuple(o[:nb] for o in outs)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd(coef, opacity, color, cfg_consts):
    nb, _, b = coef.shape
    p2 = int(cfg_consts[0]) ** 2
    (out,) = _call(
        _fwd_kernel, coef, opacity, color, [], [(nb, 4, p2)], cfg_consts
    )
    return out, (coef, opacity, color)


def _bwd(cfg_consts, residuals, g):
    coef, opacity, color = residuals
    nb, _, b = coef.shape
    dcoef, dop, dcol = _call(
        _bwd_kernel, coef, opacity, color, [g],
        [(nb, 8, b), (nb, b), (nb, 4, b)], cfg_consts,
    )
    return dcoef, dop, dcol


block_blend_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def block_blend_pallas_tf(coef, opacity, color, logti, cfg_consts):
    """Exact-T-floor blend (RasterConfig.t_floor_exact).  Same contract as
    block_blend_pallas plus logti [NB, P2]: each block's incoming log
    transmittance (from the unmasked segmented prefix).  cfg_consts is
    (tile_size, power_floor, alpha_cap, alpha_floor, log_t_floor).  The
    termination mask is constant w.r.t. gradients (reference parity), so
    logti receives a zero cotangent."""
    out, _ = _fwd_tf(coef, opacity, color, logti, cfg_consts)
    return out


def _fwd_tf(coef, opacity, color, logti, cfg_consts):
    nb, _, b = coef.shape
    p2 = int(cfg_consts[0]) ** 2
    (out,) = _call(
        _fwd_kernel_tf, coef, opacity, color, [logti], [(nb, 4, p2)], cfg_consts
    )
    return out, (coef, opacity, color, logti)


def _bwd_tf(cfg_consts, residuals, g):
    coef, opacity, color, logti = residuals
    nb, _, b = coef.shape
    dcoef, dop, dcol = _call(
        _bwd_kernel_tf, coef, opacity, color, [logti, g],
        [(nb, 8, b), (nb, b), (nb, 4, b)], cfg_consts,
    )
    return dcoef, dop, dcol, jnp.zeros_like(logti)


block_blend_pallas_tf.defvjp(_fwd_tf, _bwd_tf)
