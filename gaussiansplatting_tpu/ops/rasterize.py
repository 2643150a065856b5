"""Differentiable tiled rasterizer — block-parallel alpha blending on the MXU.

Design (TPU-first, not a port of tiledForward/tiledBackward):

The reference walks each pixel serially through its tile's depth-sorted
Gaussians (tiled_shaders.metal:307-385) and hand-derives a transmittance-replay
backward with atomic float accumulation (tiled_shaders.metal:388-738).  On TPU
we exploit that alpha compositing is *associative* in (color, transmittance)
space:  a run of Gaussians composes to a pair (C, T) and two runs combine as
(C1 + T1*C2, T1*T2).  So:

  * pairs are grouped into fixed-size blocks of B Gaussians per 16x16 tile
    (ops/pairs.py guarantees one tile per block);
  * each block evaluates all 256 x B Gaussian powers as ONE matmul
    [256, 6] @ [6, B]: the quadratic form -0.5 d^T conic d expands into 6
    pixel monomials (x2, xy, y2, x, y, 1) in tile-local coordinates times 6
    per-Gaussian coefficients — MXU work instead of a scalar loop;
  * the in-block front-to-back blend is a log-space cumulative sum
    (T_k = exp(cumsum log(1-alpha)));
  * blocks compose across a tile with a segmented prefix over block summaries
    (C_b, S_b = sum log(1-alpha)) — cheap, parallel, deterministic;
  * the backward pass is jax.grad: jax.checkpoint on the per-chunk kernel
    re-materializes block internals, which IS the reference's transmittance
    replay, but derived automatically and with deterministic segment-sum
    gradient accumulation instead of atomics.

Numerics: powers are evaluated in tile-local coordinates (pixel offsets in
[-7.5, 7.5]) so the matmul form loses no precision vs the reference's direct
d^T conic d; the per-pair constant term is one fp32 quadratic-form evaluation,
identical to the reference's per-pixel evaluation error profile.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussiansplatting_tpu.config import RasterConfig
from gaussiansplatting_tpu.core.camera import Camera
from gaussiansplatting_tpu.core.gaussians import GaussianParams
from gaussiansplatting_tpu.ops import pairs as pairs_mod
from gaussiansplatting_tpu.ops import projection as proj_mod


class RenderAux(NamedTuple):
    num_pairs: jnp.ndarray   # [] int32 pairs emitted this frame
    overflow: jnp.ndarray    # [] bool pair capacity exceeded


def _pixel_features(tile_size: int) -> jnp.ndarray:
    """[tile_size^2, 6] monomials (x2, xy, y2, x, y, 1) of tile-local pixel
    centers; identical for every tile, so computed once at trace time."""
    half = tile_size / 2.0
    coords = jnp.arange(tile_size, dtype=jnp.float32) + 0.5 - half
    y, x = jnp.meshgrid(coords, coords, indexing="ij")  # row-major pixel order
    x = x.reshape(-1)
    y = y.reshape(-1)
    return jnp.stack([x * x, x * y, y * y, x, y, jnp.ones_like(x)], axis=-1)


def _color_with_dead_zone(raw_color: jnp.ndarray) -> jnp.ndarray:
    """clamp(SH_C0*dc + 0.5, 0, 1) whose gradient is zeroed outside
    (0.01, 0.99) — the reference zeroes dL/dColor at those margins to stop
    pushing saturated colors further (tiled_shaders.metal:505-507)."""
    c = jnp.clip(raw_color, 0.0, 1.0)
    live = (c > 0.01) & (c < 0.99)
    return jnp.where(live, c, jax.lax.stop_gradient(c))


def _quad_coefs(mu: jnp.ndarray, conic: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] coefficients of the quadratic form -0.5 d^T conic d expanded
    over the pixel monomials (x2, xy, y2, x, y, 1) in tile-local coords."""
    a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
    mx, my = mu[..., 0], mu[..., 1]
    return jnp.stack(
        [
            -0.5 * a,
            -b,
            -0.5 * c,
            a * mx + b * my,
            b * mx + c * my,
            -0.5 * (a * mx * mx + 2.0 * b * mx * my + c * my * my),
        ],
        axis=-1,
    )


def _block_blend(
    mu: jnp.ndarray,       # [blocks, B, 2] screen pos relative to tile center
    conic: jnp.ndarray,    # [blocks, B, 3]
    opacity: jnp.ndarray,  # [blocks, B]
    color: jnp.ndarray,    # [blocks, B, 3]
    valid: jnp.ndarray,    # [blocks, B]
    feats: jnp.ndarray,    # [P2, 6] pixel monomials (P2 = tile_size^2)
    cfg: RasterConfig,
    logti: jnp.ndarray | None = None,  # [blocks, P2] incoming log T (t-floor)
):
    """Blend each block independently; returns per-block summaries
    (C_b [blocks, P2, 3], S_b [blocks, P2])."""
    a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
    coef = _quad_coefs(mu, conic)  # [blocks, B, 6]

    # [blocks, P2, B] = [P2, 6] @ [blocks, 6, B]  — MXU
    power = jnp.einsum(
        "pf,kbf->kpb", feats, coef, preferred_element_type=jnp.float32
    )

    g = jnp.exp(power)
    raw_alpha = opacity[:, None, :] * g
    # alpha cap: forward min(., 0.99) but gradient flows as if uncapped
    # (the reference backward ignores the cap, tiled_shaders.metal:493,518).
    alpha = raw_alpha + jax.lax.stop_gradient(
        jnp.minimum(raw_alpha, cfg.alpha_cap) - raw_alpha
    )
    conic_mag = jnp.abs(a) + jnp.abs(b) + jnp.abs(c)  # [blocks, B]
    mask = (
        valid[:, None, :]
        & (conic_mag[:, None, :] >= 1e-4)          # tiled_shaders.metal:350-351
        & (power <= 0.0)                           # skip power > 0
        & (power >= cfg.power_floor)               # skip power < -4.5
        & (alpha >= cfg.alpha_floor)               # skip alpha < 1/255
    )
    alpha = jnp.where(mask, alpha, 0.0)

    if logti is not None:
        # exact early-termination parity (tiled_shaders.metal:334): zero
        # pairs whose incoming global transmittance fell below the floor;
        # survivors' prefixes only contain survivors, so their weights are
        # unchanged.  The mask is constant w.r.t. gradients.
        l0 = jnp.log1p(-alpha)
        log_excl = jnp.cumsum(l0, axis=-1) - l0
        mask_t = jax.lax.stop_gradient(
            (log_excl + logti[:, :, None])
            > jnp.log(cfg.transmittance_floor)
        )
        alpha = jnp.where(mask_t, alpha, 0.0)

    log1m = jnp.log1p(-alpha)                      # >= log(0.01), finite
    t_local = jnp.exp(jnp.cumsum(log1m, axis=-1) - log1m)  # exclusive prefix
    weight = alpha * t_local                       # [blocks, P2, B]

    c_b = jnp.einsum(
        "kpb,kbc->kpc", weight, color, preferred_element_type=jnp.float32
    )
    s_b = jnp.sum(log1m, axis=-1)                  # [blocks, P2]
    return c_b, s_b


@jax.custom_vjp
def _permute_rows(x, order, inv_order):
    """x[order] with a gather-transpose: the cotangent of a PERMUTATION
    gather is a gather by the inverse permutation, not the general scatter
    XLA would emit (scatter costs ~2x the gather at the same index count —
    docs/DESIGN.md cost model; at 1.5M Gaussians the presort permutation is
    an N-row move each way, so this halves its backward cost)."""
    return x[order]


def _permute_rows_fwd(x, order, inv_order):
    return x[order], inv_order


def _permute_rows_bwd(inv_order, g):
    return g[inv_order], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _blend_windows(data, depth, row0, total, counts, ccounts, coffsets,
                   ty_lo, tmin_x, span_x, cfgt):
    """Pair expansion + (tile, depth) sort + WINDOWED Pallas blend as ONE
    differentiable unit: the forward never materializes an aligned pair
    array (each block DMAs its contiguous sorted-order window), and the
    backward runs the replay kernel over the same windows, then reduces the
    aligned-order column cotangents to per-Gaussian sums (the deterministic
    replacement for tiled_shaders.metal:698-736).

    Returns (out [NB, 4, P2], gid_aligned [NB, B] f32, block_tile f32).
    Differentiable in ``data`` only.
    """
    outs, _ = _blend_windows_fwd(
        data, depth, row0, total, counts, ccounts, coffsets, ty_lo, tmin_x,
        span_x, cfgt,
    )
    return outs


def _blend_windows_fwd(data, depth, row0, total, counts, ccounts, coffsets,
                       ty_lo, tmin_x, span_x, cfgt):
    from gaussiansplatting_tpu.ops import pallas_blend

    pcfg, bconsts = cfgt
    _, _, tiles_x, tiles_y, block = pcfg[:5]
    ts = int(bconsts[0])
    num_tiles = tiles_x * tiles_y
    table, block_src, block_valid, block_tile, _ = pairs_mod.pair_windows_fwd(
        data, depth, row0, counts, ccounts, coffsets, ty_lo, tmin_x, span_x,
        pcfg,
    )
    t = jnp.minimum(block_tile, num_tiles - 1)
    out, gid_f = pallas_blend.windowed_blend_fwd(
        table, block_src, block_valid, t, row0, block, bconsts
    )
    outs = (out, gid_f, block_tile.astype(jnp.float32))
    res = (table, block_src, block_valid, t, row0, gid_f, counts)
    return outs, res


def _blend_windows_bwd(cfgt, res, cts):
    from gaussiansplatting_tpu.ops import pallas_blend
    from gaussiansplatting_tpu.ops.pairs import _float0

    pcfg, bconsts = cfgt
    n = pcfg[0]
    block = pcfg[4]
    grad_reduce = pcfg[5]
    packed = len(pcfg) > 8 and pcfg[8]
    table, block_src, block_valid, tile, row0, gid_f, counts = res
    d_out = cts[0]
    dcols = pallas_blend.windowed_blend_bwd(
        table, block_src, block_valid, tile, row0, block, d_out, bconsts
    )
    # [9, a_cap] unpacked, or [5, a_cap] bf16-pair packed (see ops/packing.py)
    d_rows = jnp.stack([c.reshape(-1) for c in dcols], axis=0)
    gid_aligned = gid_f.reshape(-1).astype(jnp.int32)
    d_data = pairs_mod.reduce_aligned_cotangents(
        d_rows, gid_aligned, counts, n, grad_reduce,
        packed_out=9 if packed else 0,
    )
    zero_i32 = lambda shape: _float0(jnp.zeros(shape, jnp.int32))  # noqa: E731
    return (
        d_data,
        jnp.zeros((n,), jnp.float32),        # depth
        _float0(jnp.zeros((), jnp.int32)),   # row0
        _float0(jnp.zeros((), jnp.int32)),   # total
        zero_i32((n,)),                      # counts
        zero_i32((n,)),                      # ccounts
        zero_i32((n,)),                      # coffsets
        zero_i32((n,)),                      # ty_lo
        zero_i32((n,)),                      # tmin_x
        zero_i32((n,)),                      # span_x
    )


_blend_windows.defvjp(_blend_windows_fwd, _blend_windows_bwd)


def render(
    params: GaussianParams,
    camera: Camera,
    cfg: RasterConfig,
    vs_dummy: jnp.ndarray | None = None,
    chunk_blocks: int = 256,
    tile_rows: tuple | None = None,
):
    """Render one view.  Returns (image [H, W, 3] float32, RenderAux).

    vs_dummy: optional [N, 2] zeros added to projected screen positions; its
    cotangent is the per-Gaussian view-space positional gradient the density
    controller accumulates (reference: gradients.viewspace_grad_*,
    tiled_shaders.metal:717-720).

    tile_rows: optional (row0, n_rows) — rasterize only tile rows
    [row0, row0+n_rows) and return a [n_rows*tile_size, W, 3] strip.  n_rows
    must be a static int; row0 may be traced (the multi-chip path derives it
    from the device index).  Cull/pair semantics are identical to the full
    render restricted to the strip.
    """
    width, height = camera.width, camera.height
    ts = cfg.tile_size
    tiles_x = proj_mod.num_tiles(width, ts)
    tiles_y_img = proj_mod.num_tiles(height, ts)
    if tile_rows is None:
        row0, tiles_y = 0, tiles_y_img
    else:
        row0, tiles_y = tile_rows
    num_tiles_total = tiles_x * tiles_y
    p2 = ts * ts
    block = cfg.pair_block

    proj = proj_mod.project(params, camera, cfg)
    screen_pos = proj.screen_pos
    if vs_dummy is not None:
        screen_pos = screen_pos + vs_dummy
    color = _color_with_dead_zone(proj.color)

    # per-Gaussian render data rides the pair sorts as payload; the custom
    # VJP inside build_pair_rows reduces aligned-order cotangents straight
    # back to per-Gaussian sums (the deterministic replacement for the
    # reference's per-field atomics, tiled_shaders.metal:698-736)
    data = jnp.concatenate(
        [screen_pos, proj.conic, proj.opacity[:, None], color], axis=-1
    )  # [N, 9]

    use_pallas = cfg.blend_impl == "pallas" or (
        cfg.blend_impl == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas and not cfg.t_floor_exact:
        # Windowed path: expansion + ONE single-key tile sort + per-block
        # window DMA inside the blend kernel — no aligned array, no second
        # sort (see _blend_windows).  Depth ordering comes from a cheap
        # per-frame N-sized PRESORT of the Gaussians: expansion emits pairs
        # in Gaussian order, and lax.sort is stable, so sorting by tile
        # alone leaves every tile's run depth-sorted — the f32 depth key
        # (one more ~2.5 ms sort operand at 3M rows) never rides.
        n = proj.depth.shape[0]
        # the blend kernels pack (valid << 20 | tile) into one scalar-prefetch
        # i32 (pallas_blend._unpack_meta); tile ids must fit 20 bits
        assert num_tiles_total <= (1 << 20), (
            f"windowed blend supports at most 2^20 tiles, got "
            f"{num_tiles_total} ({tiles_x}x{tiles_y})"
        )
        row0_i = jnp.asarray(row0, jnp.int32)
        order = jnp.argsort(proj.depth)
        inv_order = (
            jnp.zeros_like(order)
            .at[order]
            .set(jnp.arange(n, dtype=order.dtype))
        )
        # ONE fused [N, 15] row-gather applies the permutation (gather cost
        # is per-INDEX, row width free — docs/DESIGN.md cost model; a
        # field-by-field tree_map risks ~12 separate N-index gathers), with
        # a gather-transpose VJP (see _permute_rows).
        # Integer fields are exact in f32 (all < 2^24).
        cols = _permute_rows(
            jnp.concatenate(
                [
                    proj.depth[:, None],
                    proj.tile_min.astype(jnp.float32),
                    proj.tile_max.astype(jnp.float32),
                    proj.n_tiles.astype(jnp.float32)[:, None],
                    data,
                ],
                axis=-1,
            ),
            order,
            inv_order,
        )
        data = cols[:, 6:]          # VJP: an N-sized scatter, ~free
        proj_p = proj_mod.Projected(
            screen_pos=data[:, :2],
            conic=data[:, 2:5],
            depth=cols[:, 0],
            opacity=data[:, 5],
            color=data[:, 6:9],
            radius=jnp.zeros_like(cols[:, 0]),          # unused post-plan
            tile_min=cols[:, 1:3].astype(jnp.int32),
            tile_max=cols[:, 3:5].astype(jnp.int32),
            n_tiles=cols[:, 5].astype(jnp.int32),
            valid=cols[:, 5] > 0,
        )

        (counts, ccounts, coffsets, ty_lo, span_x, total,
         overflow) = pairs_mod.capacity_plan(
            proj_p, tiles_x, tiles_y, cfg.pair_capacity, row0_i,
            cfg.overflow_drop, cfg.chunk_slack,
        )
        packed = cfg.payload_dtype == "bf16"
        pack_pos = bool(packed and cfg.pack_positions)
        pcfg = (
            int(n), int(cfg.pair_capacity), int(tiles_x), int(tiles_y),
            int(block), str(cfg.grad_reduce),
            pairs_mod._chunk_capacity(cfg.pair_capacity, n, cfg.chunk_slack),
            True,    # depth-presorted: tile sort is single-key
            bool(packed),  # bf16 2-in-1 payload packing (ops/packing.py)
            pack_pos,      # tile-relative bf16 position pack (roadmap #5)
            int(ts),       # tile size for expansion-time tile centers
        )
        bconsts = (ts, cfg.power_floor, cfg.alpha_cap, cfg.alpha_floor,
                   int(tiles_x), int(packed), int(pack_pos))
        out, _gid_f, bt_f = _blend_windows(
            data, proj_p.depth, row0_i, total, counts, ccounts, coffsets,
            ty_lo, proj_p.tile_min[:, 0], span_x, (pcfg, bconsts),
        )
        c_b = out[:, :3, :]                              # [NB, 3, P2]
        s_b = out[:, 3, :]
        seg = bt_f.astype(jnp.int32)
        num_blocks = seg.shape[0]
        return _compose_tiles(
            c_b, s_b, seg, None, num_blocks, num_tiles_total, tiles_x,
            tiles_y, ts, p2, width, height, cfg, tile_rows,
            RenderAux(num_pairs=total, overflow=overflow),
        )

    pair_blocks = pairs_mod.build_pair_rows(
        proj, data, tiles_x, tiles_y, cfg.pair_capacity, block, row0=row0,
        grad_reduce=cfg.grad_reduce, overflow_drop=cfg.overflow_drop,
        chunk_slack=cfg.chunk_slack,
    )
    a_cap = pair_blocks.gaussian_id.shape[0]
    num_blocks = a_cap // block

    gid = pair_blocks.gaussian_id.reshape(num_blocks, block)
    pair_valid = gid >= 0

    block_tile = jnp.minimum(pair_blocks.block_tile, num_tiles_total - 1)
    row0_f = jnp.asarray(row0, jnp.float32)
    tile_cx = (block_tile % tiles_x).astype(jnp.float32) * ts + ts / 2.0
    tile_cy = ((block_tile // tiles_x).astype(jnp.float32) + row0_f) * ts + ts / 2.0
    tile_center = jnp.stack([tile_cx, tile_cy], axis=-1)  # [NB, 2]

    # column-major pair data: each field reshapes to [NB, B] for free
    # (a [a_cap, 9] row layout would cost a full lane-relayout transpose)
    def col(i):
        return pair_blocks.rows[i].reshape(num_blocks, block)

    mu_x = col(0) - tile_center[:, 0:1]
    mu_y = col(1) - tile_center[:, 1:2]
    c_a, c_bb, c_c = col(2), col(3), col(4)
    b_opacity = col(5)
    col_r, col_g, col_b = col(6), col(7), col(8)

    # ---- per-block blended summaries ----
    feats = _pixel_features(ts)
    conic_mag = jnp.abs(c_a) + jnp.abs(c_bb) + jnp.abs(c_c)  # [NB, B]
    op_eff = jnp.where(pair_valid & (conic_mag >= 1e-4), b_opacity, 0.0)
    if use_pallas:
        # Fused Pallas kernels (forward + hand-derived replay backward);
        # see ops/pallas_blend.py.  The nine [NB, B] columns go in raw —
        # the quadratic-form coefficients are built IN KERNEL (an XLA-level
        # [NB, 8, B] stack costs a ~38 ms sublane-interleave relayout at 2M
        # pairs) and the backward returns [NB, B] column cotangents that
        # flow straight into the pair pipeline's VJP.
        from gaussiansplatting_tpu.ops.pallas_blend import (
            block_blend_cols, block_blend_cols_tf,
        )

        out = block_blend_cols(
            mu_x, mu_y, c_a, c_bb, c_c, op_eff, col_r, col_g, col_b,
            (ts, cfg.power_floor, cfg.alpha_cap, cfg.alpha_floor),
        )                                                    # [NB, 4, P2]
        c_b = out[:, :3, :]                                  # [NB, 3, P2]
        s_b = out[:, 3, :]

        def blend_tfloor(logti):
            out = block_blend_cols_tf(
                mu_x, mu_y, c_a, c_bb, c_c, op_eff, col_r, col_g, col_b,
                logti,
                (ts, cfg.power_floor, cfg.alpha_cap, cfg.alpha_floor,
                 math.log(cfg.transmittance_floor)),
            )
            return out[:, :3, :], out[:, 3, :]
    else:
        # XLA fallback: chunked scan; jax.checkpoint re-materializes block
        # internals in backward = the transmittance replay.  (The [NB, B, k]
        # stacks relayout lanes; acceptable off-TPU.)
        mu = jnp.stack([mu_x, mu_y], axis=-1)
        b_conic = jnp.stack([c_a, c_bb, c_c], axis=-1)
        b_color = jnp.stack([col_r, col_g, col_b], axis=-1)
        chunk_blocks = min(chunk_blocks, num_blocks)
        n_chunks = -(-num_blocks // chunk_blocks)
        nb_pad = n_chunks * chunk_blocks

        def pad_blocks(x):
            pad = [(0, nb_pad - num_blocks)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad)

        def chunk(x):
            return pad_blocks(x).reshape((n_chunks, chunk_blocks) + x.shape[1:])

        def chunk_fn(_, args):
            c_b, s_b = _block_blend(*args, feats, cfg)
            return None, (c_b, s_b)

        chunked = jax.tree_util.tree_map(
            chunk, (mu, b_conic, b_opacity, b_color, pair_valid)
        )
        _, (c_b, s_b) = jax.lax.scan(jax.checkpoint(chunk_fn), None, chunked)
        # channel-first [NB, 3, P2] to match the Pallas layout downstream
        c_b = c_b.reshape(nb_pad, p2, 3)[:num_blocks].transpose(0, 2, 1)
        s_b = s_b.reshape(nb_pad, p2)[:num_blocks]

        def blend_tfloor(logti):
            def chunk_fn_tf(_, args):
                *blend_args, lt = args
                c_b, s_b = _block_blend(*blend_args, feats, cfg, logti=lt)
                return None, (c_b, s_b)

            chunked_tf = jax.tree_util.tree_map(
                chunk, (mu, b_conic, b_opacity, b_color, pair_valid, logti)
            )
            _, (c2, s2) = jax.lax.scan(jax.checkpoint(chunk_fn_tf), None, chunked_tf)
            return (
                c2.reshape(nb_pad, p2, 3)[:num_blocks].transpose(0, 2, 1),
                s2.reshape(nb_pad, p2)[:num_blocks],
            )

    # ---- compose blocks within each tile ----
    seg = pair_blocks.block_tile  # [NB], == num_tiles_total for padding blocks
    return _compose_tiles(
        c_b, s_b, seg, blend_tfloor, num_blocks, num_tiles_total, tiles_x,
        tiles_y, ts, p2, width, height, cfg, tile_rows,
        RenderAux(num_pairs=pair_blocks.num_pairs,
                  overflow=pair_blocks.overflow),
    )


def _compose_tiles(c_b, s_b, seg, blend_tfloor, num_blocks, num_tiles_total,
                   tiles_x, tiles_y, ts, p2, width, height, cfg, tile_rows,
                   aux):
    """Segmented exclusive-prefix composition of per-block summaries into
    the image (the associative (C, T) combine across a tile's blocks)."""
    cum_excl = jnp.cumsum(s_b, axis=0) - s_b  # [NB, P2]
    # first block index of each tile's run
    first_block = jax.ops.segment_min(
        jnp.arange(num_blocks, dtype=jnp.int32),
        seg,
        num_segments=num_tiles_total + 1,
    )
    first_block = jnp.clip(first_block, 0, num_blocks - 1)
    base = cum_excl[first_block[jnp.minimum(seg, num_tiles_total)]]  # [NB, P2]
    t_in = jnp.exp(cum_excl - base)

    if cfg.t_floor_exact:
        # second pass with the per-block incoming log-transmittance: pairs
        # past the per-pixel termination point are zeroed and T freezes for
        # the background, exactly like tiled_shaders.metal:334.  The mask is
        # constant w.r.t. gradients (reference parity), hence stop_gradient;
        # t_in itself stays differentiable below.
        logti = jax.lax.stop_gradient(cum_excl - base)
        c_b, s_b_masked = blend_tfloor(logti)
        tile_log_t_src = s_b_masked
    else:
        tile_log_t_src = s_b

    contrib = t_in[:, None, :] * c_b  # [NB, 3, P2] (channel-first, no relayout)
    tile_color = jax.ops.segment_sum(contrib, seg, num_segments=num_tiles_total + 1)
    tile_log_t = jax.ops.segment_sum(
        tile_log_t_src, seg, num_segments=num_tiles_total + 1
    )
    tile_color = tile_color[:num_tiles_total]
    tile_log_t = tile_log_t[:num_tiles_total]

    bg = 1.0 if cfg.white_background else 0.0
    tile_img = tile_color + jnp.exp(tile_log_t)[:, None, :] * bg  # [T, 3, P2]

    # ---- tiles -> image (full image: crop to H x W; strip: keep padded rows
    #      so every device's strip has identical static shape); the
    #      channel-minor transpose is T*P2*3 elements — tiny ----
    img = tile_img.reshape(tiles_y, tiles_x, 3, ts, ts)
    img = img.transpose(0, 3, 1, 4, 2).reshape(tiles_y * ts, tiles_x * ts, 3)
    if tile_rows is None:
        img = img[:height, :width]
    else:
        img = img[:, :width]

    return img, aux
