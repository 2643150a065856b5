"""2-in-1 bf16 payload packing for sort operands.

The measured v5e cost model (docs/DESIGN.md) prices `lax.sort` at ~0.8-1 ms
per LIVE payload operand per 2-3M rows, DTYPE-INDEPENDENT — a bf16 operand
costs the same as an f32 one.  So the way to cut sort cost is to carry TWO
bf16 values per 32-bit operand: the fat (tile, depth) pair sort drops from
11 to 8 operands and the backward by-Gaussian cotangent sort from 10 to 6
(ops/pairs.py, ops/pallas_blend.py).

Precision stance: bf16 keeps f32's exponent range (nothing flushes) at 8
mantissa bits (~0.4% relative).  The reference itself accumulates color and
transmittance in HALF precision inside the forward blend
(tiled_shaders.metal:326-328), so sub-f32 render-data precision is within
the reference's own numerical envelope.  ABSOLUTE screen positions are
never packed (0.4% of an 800 px coordinate is 3 px); conic / opacity /
color and all backward cotangents are, and with
RasterConfig.pack_positions the TILE-RELATIVE positions are too (bounded
by the splat radius, so 2^-8 relative stays sub-pixel — packed at
expansion time in ops/pairs._expand_and_sort1).  Packing uses
round-to-nearest-even, not truncation, so the quantization is unbiased.

Everything here is plain bit arithmetic (bitcast + shift + mask) that lowers
identically in XLA and inside Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_bf16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Upper-16 bf16 bits of f32 ``x`` with round-to-nearest-even, as u32
    (already shifted to the high half)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    # RNE: add 0x7FFF + lsb-of-kept-part, then truncate
    rounded = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    return rounded & jnp.uint32(0xFFFF0000)


def pack2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pack two f32 arrays into one f32-typed array whose bits hold
    (bf16(a) << 16 | bf16(b)).  The f32 carrier type lets packed operands
    ride sorts, DMA windows, and kernel refs unchanged."""
    hi = _to_bf16_bits(a)
    lo = _to_bf16_bits(b) >> 16
    return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)


def unpack2(p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of pack2: returns (a, b) as f32 (exact bf16 values)."""
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    a = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    b = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return a, b


def pack_cols(cols: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """Pack consecutive column pairs; odd tail pairs with zeros."""
    out = []
    for i in range(0, len(cols), 2):
        b = cols[i + 1] if i + 1 < len(cols) else jnp.zeros_like(cols[i])
        out.append(pack2(cols[i], b))
    return out


def unpack_cols(packed: list[jnp.ndarray], n: int) -> list[jnp.ndarray]:
    """Inverse of pack_cols: first ``n`` unpacked columns."""
    out = []
    for p in packed:
        a, b = unpack2(p)
        out.append(a)
        out.append(b)
    return out[:n]
