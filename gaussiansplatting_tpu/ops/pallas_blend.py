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

The kernels take the NINE raw per-pair columns (mu, conic, opacity, color —
exactly the [NB, B] reshapes of the pair pipeline's payload rows) and build
the quadratic-form coefficient matrix IN KERNEL.  Assembling a [NB, 8, B]
coefficient tensor in XLA costs a pathological sublane-interleave relayout
(~38 ms at 2M pairs, measured round 2); in-kernel it is a [8, B]-sized
vector op per block group.

The backward replays the forward in VMEM (the reference's T-replay,
tiled_shaders.metal:429-514) and hand-derives the gradients all the way back
to the nine columns:

  dL/dl_i = g_s + Σ_{j>i} e_j w_j      (reverse-exclusive suffix, upper-
                                        triangular matmul)
  dL/da_i = e_i T_i - dL/dl_i / (1-a_i)
  dL/dpow = dL/da · a                  (cap gradient passes through, matching
                                        the reference, which ignores the 0.99
                                        cap in backward)
  dL/dcoef = featsᵀ @ dL/dpow, then the 6 quadratic-form rows chain to
  (mu_x, mu_y, conic) by per-pair algebra in kernel — so the XLA-level
  cotangents are [NB, B] columns that flow straight into the pair pipeline's
  custom VJP with no relayout.

Accumulation across pixels is deterministic matmul reduction — no float
atomics (SURVEY.md §7.1).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _group() -> int:
    """Blocks blended per Pallas program (sublane-aligned for fp32 tiles).

    Read from GS_BLEND_GROUP at CALL time, not import time (ADVICE r4: an
    import-time read silently ignores env changes made after the package is
    first imported).  With the batched triangular matmuls the group size
    sets the M dimension of the flop-dominant MXU ops ([GROUP*256, B]).
    On the compiled TPU path GROUP=8 is the only viable point (validated
    on-chip 2026-08-18, bench 10.73 it/s): values not divisible by 8 fail
    Mosaic's sublane rule for the [GROUP, block] outputs, and 16 doubles
    the backward's VMEM scratch past the 16 MB/core budget — _call_win
    guards both with explicit errors.  Interpret mode (tests) accepts any
    value; GS_BLEND_GROUP=1 remains the per-block reference path there."""
    return int(os.environ.get("GS_BLEND_GROUP", "8"))


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


def _row(ref, i):
    """Row i of a (GROUP, B) ref as [1, B]."""
    return ref[i][None, :]


def _tri_dot(x, tri, low_precision):
    """x [P2, B] @ tri [B, B] — THE flop-dominant matmuls of the blend
    kernels (503 GFLOP/step at the bench shapes, docs/DESIGN.md speed-of-
    light floor).  With ``low_precision`` (the bf16 payload mode) both
    operands go to the MXU as bf16 with f32 accumulation: the 0/1 triangle
    is exact in bf16, quantizing x costs ~2^-8 relative — inside the
    reference's own half-precision blend envelope
    (tiled_shaders.metal:326-328) — and fp32-peak 10 ms of matmul becomes
    ~2.6 ms at bf16 peak."""
    if low_precision:
        # precision must be DEFAULT here: the package-level
        # jax_default_matmul_precision="highest" would stamp the dot with
        # contract_precision<fp32>, which Mosaic rejects for bf16 operands
        # ("Bad lhs type", first observed on-chip 2026-08-18).  DEFAULT is
        # the native one-pass bf16 MXU contraction with f32 accumulation —
        # exactly the fast path this mode exists for.
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), tri.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _coef8(mx, my, a, b, c):
    """[8, B] coefficients of -0.5 d^T conic d over the pixel monomials
    (x2, xy, y2, x, y, 1) + 2 zero rows, from [1, B] columns (mirrors
    rasterize._quad_coefs; the reference evaluates the form per pixel,
    tiled_shaders.metal:343-349)."""
    z = jnp.zeros_like(a)
    return jnp.concatenate(
        [
            -0.5 * a,
            -b,
            -0.5 * c,
            a * mx + b * my,
            b * mx + c * my,
            -0.5 * (a * mx * mx + 2.0 * b * mx * my + c * my * my),
            z,
            z,
        ],
        axis=0,
    )


def _replay(coef_i, op_i, feats, power_floor, alpha_cap, alpha_floor):
    """Shared forward math for one block: returns (power, a_raw, a, l, mask)."""
    power = jnp.dot(feats, coef_i, preferred_element_type=jnp.float32)  # [P2,B]
    a_raw = op_i * jnp.exp(power)
    mask = (power <= 0.0) & (power >= power_floor) & (a_raw >= alpha_floor)
    a = jnp.where(mask, jnp.minimum(a_raw, alpha_cap), 0.0)
    l = jnp.log1p(-a)
    return power, a_raw, a, l, mask


def _read_cols(refs, i):
    """The nine [1, B] columns of block i: mx, my, ca, cb, cc, op, cr, cg, cb."""
    return tuple(_row(r, i) for r in refs)


def _fwd_body(refs, feats, i, cfg_consts):
    """Forward for block i of the group: returns (w, l, color4)."""
    _, power_floor, alpha_cap, alpha_floor = cfg_consts
    mx, my, ca, cb, cc, op, cr, cg, cbl = _read_cols(refs, i)
    coef = _coef8(mx, my, ca, cb, cc)
    _, _, a, l, _ = _replay(coef, op, feats, power_floor, alpha_cap, alpha_floor)
    tril = _tri_lower(a.shape[-1])
    cum_incl = jnp.dot(l, tril, preferred_element_type=jnp.float32)
    t = jnp.exp(cum_incl - l)             # exclusive prefix transmittance
    w = a * t                             # [P2, B]
    z = jnp.zeros_like(cr)
    color4 = jnp.concatenate([cr, cg, cbl, z], axis=0)   # [4, B]
    return w, l, color4


def _fwd_kernel(*args, cfg_consts, group):
    *refs, feats_ref, out_ref = args
    feats = feats_ref[:]                  # [P2, 8]
    for i in range(group):
        w, l, color4 = _fwd_body(refs, feats, i, cfg_consts)
        # c_b^T [4, P2]: contract over B; color row 3 is zero padding
        cbt = jax.lax.dot_general(
            color4, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_b = jnp.sum(l, axis=-1)         # [P2]
        row = jax.lax.broadcasted_iota(jnp.int32, cbt.shape, 0)
        out_ref[i] = jnp.where(row == 3, s_b[None, :], cbt)


def _chain_to_cols(dcoef, mx, my, ca, cb, cc):
    """Chain dL/dcoef [8, B] back to (dmx, dmy, dca, dcb, dcc) [1, B] each."""
    g0, g1, g2 = dcoef[0:1], dcoef[1:2], dcoef[2:3]
    g3, g4, g5 = dcoef[3:4], dcoef[4:5], dcoef[5:6]
    dca = -0.5 * g0 + mx * g3 - 0.5 * mx * mx * g5
    dcb = -g1 + my * g3 + mx * g4 - mx * my * g5
    dcc = -0.5 * g2 + my * g4 - 0.5 * my * my * g5
    dmx = ca * g3 + cb * g4 - (ca * mx + cb * my) * g5
    dmy = cb * g3 + cc * g4 - (cb * mx + cc * my) * g5
    return dmx, dmy, dca, dcb, dcc


def _bwd_kernel(*args, cfg_consts, group):
    *refs, feats_ref, g_ref = args[: 9 + 2]
    outs = args[9 + 2:]
    (dmux_ref, dmuy_ref, dca_ref, dcb_ref, dcc_ref,
     dop_ref, dcr_ref, dcg_ref, dcb2_ref) = outs
    _, power_floor, alpha_cap, alpha_floor = cfg_consts
    feats = feats_ref[:]
    for i in range(group):
        mx, my, ca, cb, cc, op, cr, cg, cbl = _read_cols(refs, i)
        coef = _coef8(mx, my, ca, cb, cc)
        power, a_raw, a, l, mask = _replay(
            coef, op, feats, power_floor, alpha_cap, alpha_floor
        )
        b = a.shape[-1]
        tril = _tri_lower(b)
        triu = _tri_upper_strict(b)
        cum_incl = jnp.dot(l, tril, preferred_element_type=jnp.float32)
        t = jnp.exp(cum_incl - l)
        w = a * t

        g = g_ref[i]                      # [4, P2]; rows 0-2 = dC, 3 = dS
        row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
        g_c = jnp.where(row == 3, 0.0, g)     # color rows only
        g_s = g[3, :]                         # [P2]

        z = jnp.zeros_like(cr)
        color4 = jnp.concatenate([cr, cg, cbl, z], axis=0)
        # e[p, j] = sum_ch gC[ch, p] * col[ch, j]
        e = jax.lax.dot_general(
            g_c, color4, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                     # [P2, B]
        ew = e * w
        dl = jnp.dot(ew, triu, preferred_element_type=jnp.float32) + g_s[:, None]
        da = e * t - dl / (1.0 - a)
        dpow = jnp.where(mask, da * a_raw, 0.0)

        dcoef = jax.lax.dot_general(
            feats, dpow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                     # [8, B]
        dmx, dmy, dca, dcb, dcc = _chain_to_cols(dcoef, mx, my, ca, cb, cc)
        dmux_ref[i] = dmx[0]
        dmuy_ref[i] = dmy[0]
        dca_ref[i] = dca[0]
        dcb_ref[i] = dcb[0]
        dcc_ref[i] = dcc[0]
        # d(op): da*exp(power) summed over pixels; a_raw = op*exp(power), so
        # sum da*a_raw then divide once per pair (saves a [P2,B] exp)
        sum_da = jnp.sum(dpow, axis=0)        # [B]; dpow == mask*da*a_raw
        opv = op[0]
        dop_ref[i] = jnp.where(opv > 0.0, sum_da / jnp.where(opv > 0.0, opv, 1.0), 0.0)
        dcol = jax.lax.dot_general(
            g_c, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                     # [4, B]
        dcr_ref[i] = dcol[0]
        dcg_ref[i] = dcol[1]
        dcb2_ref[i] = dcol[2]


def _fwd_kernel_tf(*args, cfg_consts, group):
    """T-floor forward: pairs whose incoming global transmittance is below
    the floor contribute nothing and stop updating T, matching the
    reference's per-pixel loop exit (tiled_shaders.metal:334).  The mask is
    exact because the unmasked prefix transmittance only decreases."""
    *refs, feats_ref, logti_ref, out_ref = args
    _, power_floor, alpha_cap, alpha_floor, log_thr = cfg_consts
    feats = feats_ref[:]
    for i in range(group):
        mx, my, ca, cb, cc, op, cr, cg, cbl = _read_cols(refs, i)
        coef = _coef8(mx, my, ca, cb, cc)
        _, _, a, l, _ = _replay(
            coef, op, feats, power_floor, alpha_cap, alpha_floor
        )
        tril = _tri_lower(a.shape[-1])
        cum_incl = jnp.dot(l, tril, preferred_element_type=jnp.float32)
        log_excl = cum_incl - l
        # global exclusive transmittance; termination is monotone so the
        # mask needs no iteration
        mask_t = (log_excl + logti_ref[i][:, None]) > log_thr
        w = jnp.where(mask_t, a * jnp.exp(log_excl), 0.0)
        z = jnp.zeros_like(cr)
        color4 = jnp.concatenate([cr, cg, cbl, z], axis=0)
        cbt = jax.lax.dot_general(
            color4, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_b = jnp.sum(jnp.where(mask_t, l, 0.0), axis=-1)  # frozen-T product
        row = jax.lax.broadcasted_iota(jnp.int32, cbt.shape, 0)
        out_ref[i] = jnp.where(row == 3, s_b[None, :], cbt)


def _bwd_kernel_tf(*args, cfg_consts, group):
    """T-floor replay backward: the termination mask is treated as a
    constant (the reference accumulates no gradients past lastContribIdx,
    tiled_shaders.metal:449-460)."""
    *refs, feats_ref, logti_ref, g_ref = args[: 9 + 3]
    outs = args[9 + 3:]
    (dmux_ref, dmuy_ref, dca_ref, dcb_ref, dcc_ref,
     dop_ref, dcr_ref, dcg_ref, dcb2_ref) = outs
    _, power_floor, alpha_cap, alpha_floor, log_thr = cfg_consts
    feats = feats_ref[:]
    for i in range(group):
        mx, my, ca, cb, cc, op, cr, cg, cbl = _read_cols(refs, i)
        coef = _coef8(mx, my, ca, cb, cc)
        power, a_raw, a, l, mask = _replay(
            coef, op, feats, power_floor, alpha_cap, alpha_floor
        )
        b = a.shape[-1]
        tril = _tri_lower(b)
        triu = _tri_upper_strict(b)
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

        z = jnp.zeros_like(cr)
        color4 = jnp.concatenate([cr, cg, cbl, z], axis=0)
        e = jax.lax.dot_general(
            g_c, color4, (((0,), (0,)), ((), ())),
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

        dcoef = jax.lax.dot_general(
            feats, dpow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dmx, dmy, dca, dcb, dcc = _chain_to_cols(dcoef, mx, my, ca, cb, cc)
        dmux_ref[i] = dmx[0]
        dmuy_ref[i] = dmy[0]
        dca_ref[i] = dca[0]
        dcb_ref[i] = dcb[0]
        dcc_ref[i] = dcc[0]
        sum_da = jnp.sum(dpow, axis=0)
        opv = op[0]
        dop_ref[i] = jnp.where(opv > 0.0, sum_da / jnp.where(opv > 0.0, opv, 1.0), 0.0)
        dcol = jax.lax.dot_general(
            g_c, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dcr_ref[i] = dcol[0]
        dcg_ref[i] = dcol[1]
        dcb2_ref[i] = dcol[2]


def _pad_groups(x, nb_pad):
    return jnp.pad(x, [(0, nb_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1))


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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _call(kernel, cols, extra_in, out_shapes, cfg_consts):
    """cols: nine [NB, B] arrays; extra_in: list of [NB, ...] arrays."""
    nb, b = cols[0].shape
    group = _group()
    feats = _pixel_feats8(int(cfg_consts[0]))
    p2 = feats.shape[0]
    nb_pad = -(-nb // group) * group
    cols = [_pad_groups(x, nb_pad) for x in cols]
    extra_in = [_pad_groups(x, nb_pad) for x in extra_in]

    grid = (nb_pad // group,)

    def blk(shape):
        return pl.BlockSpec(
            (group,) + shape,
            lambda g: (g,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [blk((b,)) for _ in cols] + [
        pl.BlockSpec((p2, 8), lambda g: (0, 0), memory_space=pltpu.VMEM),
    ] + [blk(x.shape[1:]) for x in extra_in]
    out_specs = tuple(blk(s[1:]) for s in out_shapes)
    outs = pl.pallas_call(
        functools.partial(kernel, cfg_consts=cfg_consts, group=group),
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
    )(*cols, feats, *extra_in)
    if len(out_shapes) == 1:
        return (outs[:nb],)
    return tuple(o[:nb] for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def block_blend_cols(mux, muy, ca, cb, cc, op, cr, cg, cbl, cfg_consts):
    """Blend from the nine raw pair columns, each [NB, B] float32:
    tile-local mean x/y, conic a/b/c, effective opacity, color r/g/b.
    cfg_consts is the static tuple (tile_size, power_floor, alpha_cap,
    alpha_floor).  Returns out [NB, 4, P2]: rows 0-2 = blended color C_b,
    row 3 = S_b (sum of log(1-alpha))."""
    out, _ = _fwd(mux, muy, ca, cb, cc, op, cr, cg, cbl, cfg_consts)
    return out


def _fwd(mux, muy, ca, cb, cc, op, cr, cg, cbl, cfg_consts):
    cols = (mux, muy, ca, cb, cc, op, cr, cg, cbl)
    nb, b = mux.shape
    p2 = int(cfg_consts[0]) ** 2
    (out,) = _call(_fwd_kernel, cols, [], [(nb, 4, p2)], cfg_consts)
    return out, cols


def _bwd(cfg_consts, residuals, g):
    cols = residuals
    nb, b = cols[0].shape
    col_shape = (nb, b)
    return _call(
        _bwd_kernel, cols, [g], [col_shape] * 9, cfg_consts
    )


block_blend_cols.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def block_blend_cols_tf(mux, muy, ca, cb, cc, op, cr, cg, cbl, logti, cfg_consts):
    """Exact-T-floor blend (RasterConfig.t_floor_exact).  Same contract as
    block_blend_cols plus logti [NB, P2]: each block's incoming log
    transmittance (from the unmasked segmented prefix).  cfg_consts is
    (tile_size, power_floor, alpha_cap, alpha_floor, log_t_floor).  The
    termination mask is constant w.r.t. gradients (reference parity), so
    logti receives a zero cotangent."""
    out, _ = _fwd_tf(mux, muy, ca, cb, cc, op, cr, cg, cbl, logti, cfg_consts)
    return out


def _fwd_tf(mux, muy, ca, cb, cc, op, cr, cg, cbl, logti, cfg_consts):
    cols = (mux, muy, ca, cb, cc, op, cr, cg, cbl)
    nb, b = mux.shape
    p2 = int(cfg_consts[0]) ** 2
    (out,) = _call(_fwd_kernel_tf, cols, [logti], [(nb, 4, p2)], cfg_consts)
    return out, cols + (logti,)


def _bwd_tf(cfg_consts, residuals, g):
    *cols, logti = residuals
    nb, b = cols[0].shape
    douts = _call(
        _bwd_kernel_tf, tuple(cols), [logti, g], [(nb, b)] * 9, cfg_consts
    )
    return douts + (jnp.zeros_like(logti),)


block_blend_cols_tf.defvjp(_fwd_tf, _bwd_tf)


# ---------------------------------------------------------------------------
# Windowed variants: blocks read their pairs straight from the (tile, depth)-
# sorted table via per-block DMA windows (ops/pairs.py::pair_windows_fwd) —
# no destination sort ever materializes an aligned array.  Window starts are
# arbitrary, and Mosaic requires 128-aligned dynamic lane offsets, so each
# block over-fetches the two aligned 128-lane tiles covering its window and
# rotates in-register (pltpu.roll) by the residual offset (~3 ms for 18k
# blocks at 800x608, vs ~27 ms for the destination sort it replaces).
# ---------------------------------------------------------------------------


def _unpack_meta(meta, row0, ts, tiles_x):
    """Per-block metadata packed into ONE scalar-prefetch i32 (SMEM is 1 MB;
    at 8M-pair capacity four [NB] arrays overflow it): bits 20.. = valid
    lane count, bits 0..19 = strip-local tile id.  Tile centers derive from
    the tile id in kernel.  CONVENTION: center = absolute_tile_index * ts +
    ts/2 — must match the expansion-time centers in
    ops/pairs._expand_and_sort1 (pack_positions) exactly;
    tests/test_packing.py::test_pack_positions_strip_render_matches_full
    pins the pairing."""
    valid = meta >> 20
    t = meta & 0xFFFFF
    half = ts / 2.0
    tcx = (t % tiles_x).astype(jnp.float32) * ts + half
    tcy = ((t // tiles_x) + row0).astype(jnp.float32) * ts + half
    return valid, tcx, tcy


def _win_cols(w, valid, tcx, tcy, packed=False, pack_pos=False):
    """Extract the kernel columns from a rolled [16, B] window.

    Unpacked rows: 0=gid, 1=sx, 2=sy, 3..5=conic, 6=opacity, 7..9=rgb.
    Packed rows (ops/packing.py): 0=gid, 1=sx, 2=sy, 3=(ca,cb), 4=(cc,op),
    5=(r,g), 6=(b,0) as bf16 pairs — unpacked here in VMEM.
    Packed + pack_pos rows: 0=gid, 1=(mx,my) already TILE-RELATIVE (packed
    at expansion time, ops/pairs._expand_and_sort1), 2=(ca,cb), 3=(cc,op),
    4=(r,g), 5=(b,0) — no center subtraction needed."""
    b = w.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    mask = lane < valid
    gid = jnp.where(mask, w[0:1], -1.0)
    if packed and pack_pos:
        from gaussiansplatting_tpu.ops.packing import unpack2

        mx, my = unpack2(w[1:2])
        ca, cb = unpack2(w[2:3])
        cc, op0 = unpack2(w[3:4])
        cr, cg = unpack2(w[4:5])
        cbl, _ = unpack2(w[5:6])
    elif packed:
        from gaussiansplatting_tpu.ops.packing import unpack2

        mx = w[1:2] - tcx
        my = w[2:3] - tcy
        ca, cb = unpack2(w[3:4])
        cc, op0 = unpack2(w[4:5])
        cr, cg = unpack2(w[5:6])
        cbl, _ = unpack2(w[6:7])
    else:
        mx = w[1:2] - tcx
        my = w[2:3] - tcy
        ca, cb, cc = w[3:4], w[4:5], w[5:6]
        op0 = w[6:7]
        cr, cg, cbl = w[7:8], w[8:9], w[9:10]
    conic_mag = jnp.abs(ca) + jnp.abs(cb) + jnp.abs(cc)
    op = jnp.where(mask & (conic_mag >= 1e-4), op0, 0.0)
    return gid, mx, my, ca, cb, cc, op, cr, cg, cbl


def _win_start_copy(src_ref, tbl_ref, scratch, sems, g, i, b, group):
    start = src_ref[g * group + i]
    a0 = (start // b) * b
    return pltpu.make_async_copy(
        tbl_ref.at[:, pl.ds(a0, 2 * b)], scratch.at[i], sems.at[i]
    ), start - a0


def _power_impl() -> str:
    """Quadratic-form evaluation strategy, read per trace (GS_BLEND_POWER):

    * "mxu" (default): [P2, 8] @ [8, GROUP*B] coefficient matmul.  The MXU
      pads K=8 to the 128-wide systolic array, so this costs ~16x its
      useful flops — at bf16 triangular-matmul rate it (and the M=8 dcoef
      matmul in the backward) becomes the kernel's MXU-effective
      bottleneck.
    * "vpu": direct 6-FMA evaluation of -0.5 d^T conic d on the VPU
      ([P2, GROUP*B] elementwise with row/column broadcasts) and a
      sublane-reduction backward — no padded small-K/small-M MXU issues.
      Identical math, fp32 either way (reassociation-level differences
      only).  On-chip A/B via the round-5 chain."""
    return os.environ.get("GS_BLEND_POWER", "mxu")


def _group_replay(cols, feats, consts):
    """Batched replay for a whole GROUP: evaluate every block's powers in
    ONE op — an [P2, 8] @ [8, GROUP*B] MXU matmul or the VPU 6-FMA form
    (see _power_impl) — and every elementwise stage on ONE [P2, GROUP*B]
    tensor: GROUP x fewer issues than per-block evaluation, identical
    values.  Returns (a_raw, a, l) as [P2, GROUP*B]."""
    power_floor, alpha_cap, alpha_floor = consts
    op_cat = jnp.concatenate([c[5] for c in cols], axis=1)   # [1, GROUP*B]
    if _power_impl() == "vpu":
        px = feats[:, 3:4]                 # pixel x (feats col 3), [P2, 1]
        py = feats[:, 4:5]
        mx_c = jnp.concatenate([c[0] for c in cols], axis=1)
        my_c = jnp.concatenate([c[1] for c in cols], axis=1)
        ca_c = jnp.concatenate([c[2] for c in cols], axis=1)
        cb_c = jnp.concatenate([c[3] for c in cols], axis=1)
        cc_c = jnp.concatenate([c[4] for c in cols], axis=1)
        dx = px - mx_c                     # [P2, GROUP*B]
        dy = py - my_c
        power = -0.5 * (ca_c * dx * dx + cc_c * dy * dy) - cb_c * (dx * dy)
    else:
        coef_cat = jnp.concatenate(
            [_coef8(mx, my, ca, cb, cc)
             for (mx, my, ca, cb, cc, *_r) in cols],
            axis=1,
        )                                  # [8, GROUP*B]
        power = jnp.dot(feats, coef_cat, preferred_element_type=jnp.float32)
    a_raw = op_cat * jnp.exp(power)
    mask = (power <= 0.0) & (power >= power_floor) & (a_raw >= alpha_floor)
    a = jnp.where(mask, jnp.minimum(a_raw, alpha_cap), 0.0)
    return a_raw, a, jnp.log1p(-a)


def _fwd_kernel_win(src_ref, meta_ref, row0_ref, tbl_ref, feats_ref,
                    out_ref, gid_ref, scratch, sems, l_sc, a_sc, *,
                    cfg_consts, group):
    ts_, power_floor, alpha_cap, alpha_floor, tiles_x = cfg_consts[:5]
    packed = len(cfg_consts) > 5 and bool(cfg_consts[5])
    pack_pos = len(cfg_consts) > 6 and bool(cfg_consts[6])
    g = pl.program_id(0)
    b = gid_ref.shape[-1]
    p2 = feats_ref.shape[0]
    nlive = meta_ref[g * group] >> 20
    for i in range(1, group):
        nlive = nlive + (meta_ref[g * group + i] >> 20)

    @pl.when(nlive > 0)
    def _():
        offs = []
        for i in range(group):
            cp, off = _win_start_copy(
                src_ref, tbl_ref, scratch, sems, g, i, b, group
            )
            cp.start()
            offs.append((cp, off))
        feats = feats_ref[:]
        tril = _tri_lower(b)
        # Phase 1: unpack every block's columns, then one batched replay
        # (see _group_replay) and ONE [GROUP*P2, B] @ [B, B] triangular
        # prefix instead of GROUP separate MXU issues (prefix is per-row,
        # so row-stacking blocks is exact; docs/DESIGN.md §Batched-group).
        cols = []
        for i in range(group):
            cp, off = offs[i]
            cp.wait()
            w = pltpu.roll(scratch[i], -off, 1)[:, :b]
            valid, tcx, tcy = _unpack_meta(
                meta_ref[g * group + i], row0_ref[0], ts_, tiles_x
            )
            gid, *c9 = _win_cols(w, valid, tcx, tcy, packed, pack_pos)
            cols.append(tuple(c9))
            gid_ref[i] = gid[0]
        _, a_all, l_all = _group_replay(
            cols, feats, (power_floor, alpha_cap, alpha_floor)
        )
        for i in range(group):                      # lane-major -> row-major
            lane = slice(i * b, (i + 1) * b)
            l_sc[i * p2:(i + 1) * p2] = l_all[:, lane]
            a_sc[i * p2:(i + 1) * p2] = a_all[:, lane]
        cum_all = _tri_dot(l_sc[:], tril, packed)   # one batched prefix
        # Phase 2: per-block blend from the shared prefix
        for i in range(group):
            sl = slice(i * p2, (i + 1) * p2)
            l = l_sc[sl]
            t = jnp.exp(cum_all[sl] - l)
            wgt = a_sc[sl] * t
            _, _, _, _, _, _, cr, cg, cbl = cols[i]
            z = jnp.zeros_like(cr)
            color4 = jnp.concatenate([cr, cg, cbl, z], axis=0)
            cbt = jax.lax.dot_general(
                color4, wgt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s_b = jnp.sum(l, axis=-1)
            row = jax.lax.broadcasted_iota(jnp.int32, cbt.shape, 0)
            out_ref[i] = jnp.where(row == 3, s_b[None, :], cbt)

    @pl.when(nlive == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)
        gid_ref[...] = jnp.full(gid_ref.shape, -1.0, jnp.float32)


def _bwd_kernel_win(src_ref, meta_ref, row0_ref, tbl_ref, feats_ref,
                    g_ref, *refs, cfg_consts, group):
    ts_, power_floor, alpha_cap, alpha_floor, tiles_x = cfg_consts[:5]
    packed = len(cfg_consts) > 5 and bool(cfg_consts[5])
    pack_pos = len(cfg_consts) > 6 and bool(cfg_consts[6])
    *out_refs, scratch, sems, l_sc, a_sc, araw_sc, et_sc, w_sc, ew_sc = refs
    g = pl.program_id(0)
    b = out_refs[0].shape[-1]
    p2 = feats_ref.shape[0]
    nlive = meta_ref[g * group] >> 20
    for i in range(1, group):
        nlive = nlive + (meta_ref[g * group + i] >> 20)

    @pl.when(nlive > 0)
    def _():
        offs = []
        for i in range(group):
            cp, off = _win_start_copy(
                src_ref, tbl_ref, scratch, sems, g, i, b, group
            )
            cp.start()
            offs.append((cp, off))
        feats = feats_ref[:]
        tril = _tri_lower(b)
        triu = _tri_upper_strict(b)
        # Phase 1: batched replay (see _group_replay) to log(1-alpha); the
        # two flop-dominant triangular matmuls then each run ONCE over the
        # sublane-stacked [GROUP*P2, B] group (prefix/suffix are per-row
        # operations, so stacking blocks on rows is exact) instead of GROUP
        # separate MXU issues each.  `mask` is not stored: a > 0 iff the
        # replay mask held (masked alpha has a strict 1/255 floor).
        cols = []
        for i in range(group):
            cp, off = offs[i]
            cp.wait()
            w = pltpu.roll(scratch[i], -off, 1)[:, :b]
            valid, tcx, tcy = _unpack_meta(
                meta_ref[g * group + i], row0_ref[0], ts_, tiles_x
            )
            _, *c9 = _win_cols(w, valid, tcx, tcy, packed, pack_pos)
            cols.append(tuple(c9))
        araw_all, a_all, l_all = _group_replay(
            cols, feats, (power_floor, alpha_cap, alpha_floor)
        )
        for i in range(group):                      # lane-major -> row-major
            lane = slice(i * b, (i + 1) * b)
            sl = slice(i * p2, (i + 1) * p2)
            l_sc[sl] = l_all[:, lane]
            a_sc[sl] = a_all[:, lane]
            araw_sc[sl] = araw_all[:, lane]
        cum_all = _tri_dot(l_sc[:], tril, packed)
        power_vpu = _power_impl() == "vpu"
        # Phase 2: transmittance + cotangent-weighted terms per block
        gss = []
        for i in range(group):
            sl = slice(i * p2, (i + 1) * p2)
            t = jnp.exp(cum_all[sl] - l_sc[sl])
            wgt = a_sc[sl] * t
            gg = g_ref[i]                      # [4, P2]; rows 0-2 = dC, 3 = dS
            row = jax.lax.broadcasted_iota(jnp.int32, gg.shape, 0)
            g_c = jnp.where(row == 3, 0.0, gg)
            gss.append((g_c, gg[3, :]))
            _, _, _, _, _, _, cr, cg, cbl = cols[i]
            if power_vpu:
                # K=4 matmul (32x MXU padding) -> three outer-product FMAs
                e = (
                    gg[0, :][:, None] * cr
                    + gg[1, :][:, None] * cg
                    + gg[2, :][:, None] * cbl
                )
            else:
                z = jnp.zeros_like(cr)
                color4 = jnp.concatenate([cr, cg, cbl, z], axis=0)
                e = jax.lax.dot_general(
                    g_c, color4, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            et_sc[sl] = e * t
            w_sc[sl] = wgt
            ew_sc[sl] = e * wgt
        dl_all = _tri_dot(ew_sc[:], triu, packed)
        # Phase 3: per-block chain rule to the nine column cotangents
        for i in range(group):
            sl = slice(i * p2, (i + 1) * p2)
            mx, my, ca, cb, cc, op, cr, cg, cbl = cols[i]
            g_c, g_s = gss[i]
            a = a_sc[sl]
            dl = dl_all[sl] + g_s[:, None]
            da = et_sc[sl] - dl / (1.0 - a)
            dpow = jnp.where(a > 0.0, da * araw_sc[sl], 0.0)

            if power_vpu:
                # sublane-reduction backward instead of the M=8 dcoef
                # matmul (see _power_impl): d power/d mx = ca*dx + cb*dy,
                # so the five cotangents are moment sums of dpow against
                # (dx, dy) — same algebra as _chain_to_cols, regrouped
                px = feats[:, 3:4]
                py = feats[:, 4:5]
                dx = px - mx
                dy = py - my
                pdx = dpow * dx
                pdy = dpow * dy
                s_x = jnp.sum(pdx, axis=0, keepdims=True)     # [1, B]
                s_y = jnp.sum(pdy, axis=0, keepdims=True)
                dca = -0.5 * jnp.sum(pdx * dx, axis=0, keepdims=True)
                dcb = -jnp.sum(pdx * dy, axis=0, keepdims=True)
                dcc = -0.5 * jnp.sum(pdy * dy, axis=0, keepdims=True)
                dmx = ca * s_x + cb * s_y
                dmy = cb * s_x + cc * s_y
            else:
                dcoef = jax.lax.dot_general(
                    feats, dpow, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dmx, dmy, dca, dcb, dcc = _chain_to_cols(
                    dcoef, mx, my, ca, cb, cc
                )
            sum_da = jnp.sum(dpow, axis=0)
            opv = op[0]
            dop = jnp.where(
                opv > 0.0, sum_da / jnp.where(opv > 0.0, opv, 1.0), 0.0
            )
            if power_vpu:
                # M=4 matmul (32x MXU padding) -> three sublane reductions
                w_i = w_sc[sl]
                dcr = jnp.sum(g_c[0, :][:, None] * w_i, axis=0)
                dcg = jnp.sum(g_c[1, :][:, None] * w_i, axis=0)
                dcb2 = jnp.sum(g_c[2, :][:, None] * w_i, axis=0)
            else:
                dcol = jax.lax.dot_general(
                    g_c, w_sc[sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dcr, dcg, dcb2 = dcol[0], dcol[1], dcol[2]
            cots = (dmx[0], dmy[0], dca[0], dcb[0], dcc[0],
                    dop, dcr, dcg, dcb2)
            if packed:
                # bf16-pair pack the nine cotangents into five output rows;
                # the by-gid reduction sort then carries 6 operands instead
                # of 10 (ops/pairs.reduce_aligned_cotangents unpacks AFTER
                # the sort, so the f32 prefix sums stay exact)
                from gaussiansplatting_tpu.ops.packing import pack2

                z = jnp.zeros_like(dop)
                for j, ref in enumerate(out_refs):
                    aa = cots[2 * j]
                    bb = cots[2 * j + 1] if 2 * j + 1 < 9 else z
                    ref[i] = pack2(aa, bb)
            else:
                for j, ref in enumerate(out_refs):
                    ref[i] = cots[j]

    @pl.when(nlive == 0)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros(r.shape, jnp.float32)


def _max_call_blocks() -> int:
    """Max blocks per windowed pallas_call: src + meta scalar-prefetch
    operands are [NB] i32 each and SMEM is 1 MB, so a single call tops out
    around 128k blocks.  Chunking the grid keeps each call at <=256 KB of
    SMEM and makes the pipeline scale to the reference's 16M-pair
    provisioning (tiled_rasterizer.mm:144: maxPairs = maxGaussians * 8).
    Read from GS_MAX_CALL_BLOCKS at CALL time so bench.py --smoke's
    chunked-grid override works regardless of package import order
    (ADVICE r4)."""
    return int(os.environ.get("GS_MAX_CALL_BLOCKS", "32768"))


# trace-time observability: how many pallas_call chunks the last traced
# windowed call issued (tests assert the chunked-grid code shape is really
# exercised; VERDICT r4 item 7)
LAST_WIN_CALLS = 0


def _call_win(kernel, table, src, valid, tile, row0, block, extra_in,
              out_shapes, cfg_consts, group_scratch=0):
    """pallas_call builder for the windowed kernels.

    table [R, EP] (R = 8 packed / 16 unpacked) rides in ANY memory space
    (manual per-block DMA); the per-block source starts and the packed
    (valid << 20 | tile) metadata are scalar-prefetched (SMEM is 1 MB — at
    8M-pair capacity separate valid/tcx/tcy arrays overflow it, and past
    ~12M even src+meta do, so the grid is chunked at _MAX_CALL_BLOCKS).

    group_scratch: number of [GROUP*P2, block] f32 VMEM scratch buffers the
    kernel uses to stack per-block intermediates for the batched triangular
    matmuls (2 fwd, 6 bwd — ~1 MB each at block 128)."""
    nb = src.shape[0]
    group = _group()
    feats = _pixel_feats8(int(cfg_consts[0]))
    p2 = feats.shape[0]
    rows = table.shape[0]
    nb_pad = -(-nb // group) * group
    if not _interpret():
        # _win_start_copy aligns DMA window starts to `block`; Mosaic
        # requires 128-lane alignment for dynamic lane offsets, so the
        # compiled TPU path only supports 128-multiple blocks (tests use
        # smaller blocks in interpret mode only).
        assert block % 128 == 0, (
            f"windowed TPU blend needs pair_block % 128 == 0, got {block}"
        )
        # Sublane guard (measured on-chip 2026-08-18): the [GROUP, block]
        # per-block outputs (gid floats etc.) lower as blocks with GROUP as
        # the second-to-last dim, and Mosaic requires it divisible by 8 —
        # GS_BLEND_GROUP=4 (and =1) fail at lowering with a BlockSpec error.
        # Combined with the VMEM ceiling below (16 cannot fit), GROUP=8 is
        # the only compiled-path point; other values remain available in
        # interpret mode for tests.
        if group % 8 != 0:
            raise ValueError(
                f"GS_BLEND_GROUP={group} does not lower on TPU: Mosaic "
                "needs the [GROUP, block] output block sublane-divisible "
                "by 8. Use a multiple of 8 (8 fits VMEM; interpret mode "
                "accepts any value)."
            )
        # VMEM ceiling guard (ADVICE r4): the batched-group kernels hold
        # group_scratch [group*P2, block] f32 stacks, the [group, rows,
        # 2*block] DMA window scratch, and ~4 [P2, group*block] batched-
        # replay temporaries live at once.  At group=8/block=128 the
        # backward sits at ~11 MB of the 16 MB/core budget; group=16
        # (~22 MB) cannot compile.  Fail with an actionable message
        # instead of a Mosaic OOM.
        f32 = 4
        vmem_est = (
            group_scratch * group * p2 * block * f32    # stacked scratch
            + group * rows * 2 * block * f32            # DMA windows
            + 4 * p2 * group * block * f32              # replay temporaries
        )
        if vmem_est > 14 * 2**20:
            raise ValueError(
                f"GS_BLEND_GROUP={group} needs ~{vmem_est / 2**20:.1f} MB "
                f"of VMEM scratch at block={block} (budget ~16 MB/core). "
                "Lower GS_BLEND_GROUP (8 fits; 1 = per-block fallback)."
            )

    def padnb(x, fill=0):
        return jnp.pad(x, (0, nb_pad - nb), constant_values=fill)

    src = padnb(src)
    meta = padnb((valid << 20) | tile)
    row0 = jnp.asarray(row0, jnp.int32).reshape(1)
    extra_in = [_pad_groups(x, nb_pad) for x in extra_in]

    def blk(shape):
        return pl.BlockSpec(
            (group,) + shape,
            lambda g, *_: (g,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def one_call(src_c, meta_c, extra_c, nb_c):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb_c // group,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (p2, 8), lambda g, *_: (0, 0), memory_space=pltpu.VMEM
                ),
            ] + [blk(x.shape[1:]) for x in extra_c],
            out_specs=tuple(blk(s[1:]) for s in out_shapes)
            if len(out_shapes) > 1 else blk(out_shapes[0][1:]),
            scratch_shapes=[
                pltpu.VMEM((group, rows, 2 * block), jnp.float32),
                pltpu.SemaphoreType.DMA((group,)),
            ] + [
                pltpu.VMEM((group * p2, block), jnp.float32)
                for _ in range(group_scratch)
            ],
        )
        return pl.pallas_call(
            functools.partial(kernel, cfg_consts=cfg_consts, group=group),
            grid_spec=grid_spec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((nb_c,) + s[1:], jnp.float32)
                for s in out_shapes
            )
            if len(out_shapes) > 1
            else jax.ShapeDtypeStruct((nb_c,) + out_shapes[0][1:], jnp.float32),
            interpret=_interpret(),
        )(src_c, meta_c, row0, table, feats, *extra_c)

    global LAST_WIN_CALLS
    max_call_blocks = -(-_max_call_blocks() // group) * group
    LAST_WIN_CALLS = -(-nb_pad // max_call_blocks)
    if nb_pad <= max_call_blocks:
        outs = one_call(src, meta, extra_in, nb_pad)
        if len(out_shapes) == 1:
            return (outs[:nb],)
        return tuple(o[:nb] for o in outs)

    # chunked grid: table (absolute src offsets) is shared; src/meta/extras
    # and the per-block outputs slice along the block axis
    chunks = []
    for lo in range(0, nb_pad, max_call_blocks):
        hi = min(lo + max_call_blocks, nb_pad)
        outs_c = one_call(
            src[lo:hi], meta[lo:hi], [x[lo:hi] for x in extra_in], hi - lo
        )
        chunks.append(outs_c if len(out_shapes) > 1 else (outs_c,))
    outs = tuple(
        jnp.concatenate([c[j] for c in chunks], axis=0)[:nb]
        for j in range(len(out_shapes))
    )
    return outs


def windowed_blend_fwd(table, src, valid, tile, row0, block, cfg_consts):
    """Forward windowed blend: returns (out [NB, 4, P2], gid [NB, B] f32)."""
    nb = src.shape[0]
    p2 = int(cfg_consts[0]) ** 2
    return _call_win(
        _fwd_kernel_win, table, src, valid, tile, row0, block, [],
        [(nb, 4, p2), (nb, block)], cfg_consts, group_scratch=2,
    )


def windowed_blend_bwd(table, src, valid, tile, row0, block, g, cfg_consts):
    """Backward windowed blend: aligned-order column cotangents — nine
    [NB, B] arrays (mux, muy, ca, cb, cc, op, r, g, b), or five bf16-pair
    packed arrays when cfg_consts[5] (payload packing) is set."""
    nb = src.shape[0]
    packed = len(cfg_consts) > 5 and bool(cfg_consts[5])
    n_out = 5 if packed else 9
    return _call_win(
        _bwd_kernel_win, table, src, valid, tile, row0, block, [g],
        [(nb, block)] * n_out, cfg_consts, group_scratch=6,
    )
