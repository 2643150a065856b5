"""Speed-of-light model for one train step (VERDICT r2 item 4).

Answers "how far is the measured step from what v5e hardware allows?"
without resting on the soft 10 it/s anchor.  Two ingredients:

  * a SINGLE-TOUCH byte count: every array each pipeline stage must read
    or write at least once, at the STATIC shapes actually dispatched
    (index ops process full static rows regardless of live occupancy).
    This is a hard lower bound on HBM traffic — real sorts are multi-pass
    (lax.sort measures ~9 single-touch equivalents per operand,
    docs/DESIGN.md), so achieved bandwidth computed from it UNDERSTATES
    the truth by the pass count of the sort fraction.
  * an MXU FLOP count of the blend kernels' matmuls (the only
    FLOP-significant ops; everything else is bandwidth).

The floor is max(bytes / HBM_BW, flops / MXU_PEAK): a step faster than
that is impossible on this chip for this dataflow.  bench.py reports
  hbm_gbps_achieved   = single-touch bytes / measured step time
  mfu_pct             = MXU flops / (measured time x fp32 peak)
  model_bound_fraction= hardware floor / measured time
(1.0 = at speed of light for the single-touch model).

v5e numbers: 819 GB/s HBM, 197 TFLOP/s bf16, ~49 TFLOP/s fp32 (the MXU
runs fp32 as multi-pass bf16).
"""

from __future__ import annotations

V5E_HBM_GBPS = 819.0
V5E_F32_TFLOPS = 49.2
V5E_BF16_TFLOPS = 196.7

F32 = 4


def step_model(
    n: int,
    pair_capacity: int,
    height: int,
    width: int,
    tile_size: int = 16,
    block: int = 128,
    packed: bool = False,
    chunk_slack: float = 1.0,
    pack_positions: bool = False,
) -> dict:
    """Single-touch bytes + MXU flops for one fwd+bwd+Adam step at the
    given STATIC shapes.  Returns a dict with per-stage bytes, totals, and
    the hardware floor in ms."""
    from gaussiansplatting_tpu.ops import pairs as pairs_mod

    tiles_x = -(-width // tile_size)
    tiles_y = -(-height // tile_size)
    tiles = tiles_x * tiles_y
    p2 = tile_size * tile_size
    e_cap = (
        pairs_mod._chunk_capacity(pair_capacity, n, chunk_slack)
        * pairs_mod.PAIR_CHUNK
    )
    a_cap = pairs_mod.aligned_capacity(pair_capacity, tiles, block)
    nb = a_cap // block

    # data operands riding the fat sort: 9 f32, 6 bf16-packed, 5 with the
    # tile-relative position pack (RasterConfig.pack_positions)
    d_sort = (5 if pack_positions else 6) if packed else 9
    rows = 8 if packed else 16           # window-table rows (one/two tiles)
    n_out = 5 if packed else 9           # backward cotangent operands
    d_full = 9                           # unpacked cotangent columns

    npix = height * width

    b = {}
    # per-frame depth presort of the Gaussians (key + permutation index)
    b["presort"] = 2 * 2 * n * F32
    # chunk gather reads the [N, 6+D] table once, expansion writes
    # (key, gid, data) rows
    b["expand"] = n * (6 + d_sort) * F32 + e_cap * (2 + d_sort) * F32
    # fat (tile, depth-presorted) sort: read + write all operands ONCE
    b["fat_sort"] = 2 * e_cap * (2 + d_sort) * F32
    # window table write + forward per-block DMA (2x over-fetch) + outputs
    b["blend_fwd"] = (
        rows * e_cap * F32
        + nb * rows * 2 * block * F32
        + nb * (4 * p2 + block) * F32
    )
    # backward: window DMA again, image cotangent in, column cotangents out
    b["blend_bwd"] = (
        nb * rows * 2 * block * F32
        + nb * 4 * p2 * F32
        + nb * n_out * block * F32
    )
    # by-Gaussian reduction sort + prefix sums + endpoint gathers
    b["grad_reduce"] = (
        2 * a_cap * (1 + n_out) * F32
        + 2 * a_cap * d_full * F32
        + 2 * n * d_full * F32
    )
    # compose tiles -> image, L1 + D-SSIM band matmuls (~12 image touches)
    b["image_loss"] = nb * 4 * p2 * F32 + 12 * npix * 3 * F32
    # projection fwd+bwd (~40 f32 fields per Gaussian each way)
    b["projection"] = 2 * 40 * n * F32
    # Adam: 23 trainable floats per Gaussian; read p/m/v/g, write p/m/v
    b["optimizer"] = 7 * 23 * n * F32

    bytes_total = float(sum(b.values()))

    # MXU flops: blend fwd (power + triangular prefix + color) and bwd
    # (replay + two triangular + e/dcoef/dcol) per block, SSIM band blurs
    tri_mm = 3 * 2 * p2 * block * block   # fwd 1 + bwd 2 triangular matmuls
    other_mm = (
        2 * 2 * p2 * 8 * block            # power (fwd + bwd replay)
        + 2 * 4 * p2 * block              # fwd color contraction
        + 2 * p2 * 4 * block              # bwd e
        + 2 * 8 * p2 * block              # bwd dcoef
        + 2 * 4 * p2 * block              # bwd dcol
    )
    ssim = 4 * 2 * 11 * npix * 3 * 2     # 4 blurs x 2 band matmuls x 11-wide
    flops_total = float(nb * (tri_mm + other_mm) + ssim)

    # packed mode runs the DOMINANT triangular matmuls as bf16 x bf16 -> f32
    # (ops/pallas_blend._tri_dot), so their floor is the bf16 peak
    tri_peak = (V5E_BF16_TFLOPS if packed else V5E_F32_TFLOPS) * 1e12
    t_bytes_ms = bytes_total / (V5E_HBM_GBPS * 1e9) * 1e3
    t_flops_ms = (
        nb * tri_mm / tri_peak
        + (nb * other_mm + ssim) / (V5E_F32_TFLOPS * 1e12)
    ) * 1e3
    return {
        "bytes_by_stage": b,
        "bytes_total": bytes_total,
        "mxu_flops": flops_total,
        "t_bytes_ms": t_bytes_ms,
        "t_flops_ms": t_flops_ms,
        "floor_ms": max(t_bytes_ms, t_flops_ms),
    }
