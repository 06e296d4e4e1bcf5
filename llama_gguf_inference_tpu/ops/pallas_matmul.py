"""Pallas TPU kernels: fused dequant + matmul over QuantLinear weights.

The TPU replacement for llama.cpp's per-quant-type CUDA ``mul_mat`` kernels
(reference backend, SURVEY.md §2.9).  Decode throughput is HBM-bandwidth
bound, so weights must stream at their *packed* width — the XLA fallback
materializes a bf16 copy in HBM (4× the traffic for 4-bit formats); these
kernels dequantize in VMEM instead:

    grid over out-feature tiles; per step:
      DMA packed codes + scale hierarchy tile -> VMEM     (pipelined by Pallas)
      VPU: planar-split unpack (mask/shift + lane-aligned concat),
           w = q * s_sub - m_sub   with s_sub = repeat(d) * sc  (f32 -> bf16)
      MXU: y_tile = x @ w.T       (B, in) x (TO, in) -> (B, TO)

The planar pack layout (see quant.repack._pack4) makes unpack two full-width
bitops + one concat at a lane-aligned boundary — no element interleaving.

All decode-rule parameters (bits, sub_size, d_size, bias, which scale arrays
exist) are static per weight, so each (format, shape) pair compiles one
specialized kernel, cached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear import QuantLinear

_LANE = 128


def _pick_tile(out_features: int, in_features: int, code_bytes_per_row: int) -> int:
    """Largest out-tile that divides out_features and keeps VMEM modest."""
    # budget ~6MB for (2x codes tile + bf16 w tile + scales)
    for to in (512, 256, 128, 64, 32, 16, 8):
        if out_features % to:
            continue
        vmem = to * code_bytes_per_row * 2 + to * in_features * 2
        if vmem <= 6 * 1024 * 1024:
            return to
    return 0


def _unpack_planar(codes, bits: int):
    """codes (TO, in*bits//8) uint8 -> int32 codes (TO, in), logical order."""
    b = codes.astype(jnp.int32)
    if bits == 8:
        return b
    if bits == 4:
        return jnp.concatenate([b & 0x0F, b >> 4], axis=1)
    if bits == 2:
        return jnp.concatenate([b & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3],
                               axis=1)
    raise NotImplementedError(f"bits={bits}")


def _expand_scales(d, sc, sub_size: int, d_size: int, in_features: int):
    """Per-sub-block effective scale (TO, g*nd) in block-minor (s, σ) order.

    Storage is block-minor (quant.repack.block_minor_perm), so the expansion
    d (TO, nd) -> (TO, g*nd) is a TILE — ``full[k] = d[k mod nd] = d[σ]`` —
    which pltpu.repeat implements natively on the lane dimension.
    """
    g = d_size // sub_size
    s = d
    if g > 1:
        s = pltpu.repeat(s, g, axis=1)
    if sc is not None:
        # Mosaic has no direct (u)int8 -> f32 cast; go through int32
        s = s * sc.astype(jnp.int32).astype(jnp.float32)
    return s


def _make_kernel(meta: tuple, B: int, TO: int, in_features: int):
    """Build the kernel body for one (format, tile) specialization."""
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed) = meta

    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        codes_ref = refs[idx]; idx += 1
        d_ref = refs[idx]; idx += 1
        sc_ref = dmin_ref = mn_ref = None
        if has_sc:
            sc_ref = refs[idx]; idx += 1
        if has_dmin:
            dmin_ref = refs[idx]; idx += 1
        if has_mn:
            mn_ref = refs[idx]; idx += 1
        o_ref = refs[idx]

        # Everything below is in block-minor element order; the caller
        # pre-transposed the activations to match.
        #
        # Scale hierarchy (small arrays, f32): s_sub = repeat(d)*sc, and the
        # code bias + magic offset fold into a per-sub-block min term:
        #   w = (raw - bias)*s - m  ==  raw*s - (bias*s + m)
        s_sub = _expand_scales(d_ref[:],
                               sc_ref[:] if sc_ref is not None else None,
                               sub_size, d_size, in_features)   # (TO, g*nd) f32
        m_sub = jnp.zeros_like(s_sub)
        if has_dmin:
            m_sub = _expand_scales(dmin_ref[:],
                                   mn_ref[:] if mn_ref is not None else None,
                                   sub_size, d_size, in_features)

        if bits == 4:
            # bf16 magic-number unpack: for a 4-bit code q, the u16 pattern
            # 0x4300 | q bitcasts to bf16 value (128 + q) exactly.  The 128
            # offset is removed BEFORE scaling (exact bf16 integer subtract);
            # folding it into the min term instead would catastrophically
            # cancel in bf16.  All full-width ops run at u16/bf16 density.
            # shift/mask in i32 (Mosaic legalizes i32 shifts only), then
            # drop to u16 for the magic OR + bitcast
            c32 = codes_ref[:].astype(jnp.int32)                # (TO, in/2)
            q16 = jnp.concatenate([c32 & 0xF, c32 >> 4],
                                  axis=1).astype(jnp.uint16)
            v = pltpu.bitcast(q16 | jnp.uint16(0x4300), jnp.bfloat16)
            v = v - jnp.bfloat16(128.0)                          # exact: v = q
            m_sub = m_sub + float(bias) * s_sub                  # fold code bias
        else:
            # 8-bit codes can't ride the bf16 magic (9-bit int range exceeds
            # bf16's 7 mantissa bits) — and the i32/f32 path already streams
            # int8 formats at HBM roofline.  2-bit formats also go here.
            q = _unpack_planar(codes_ref[:], bits)
            v = (q - bias).astype(jnp.float32)
            # bias handled directly; no fold
            s_full = pltpu.repeat(s_sub, sub_size, axis=1)
            w = v * s_full
            if has_dmin:
                w = w - pltpu.repeat(m_sub, sub_size, axis=1)
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return

        s_full = pltpu.repeat(s_sub.astype(jnp.bfloat16), sub_size, axis=1)
        m_full = pltpu.repeat(m_sub.astype(jnp.bfloat16), sub_size, axis=1)
        w = v * s_full - m_full                                  # bf16 FMA

        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "shapes", "interpret"))
def _quant_matmul_2d(x, codes, d, sc, dmin, mn, *, meta, shapes,
                     interpret=False):
    """x (B, in) bf16 -> (B, out) f32 via the tiled Pallas kernel."""
    (B, in_features, out_features, TO) = shapes
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed) = meta
    n_tiles = out_features // TO
    cb = codes.shape[1]                      # packed bytes per row
    nsub = in_features // sub_size
    nd = in_features // d_size

    in_specs = [
        pl.BlockSpec((B, in_features), lambda o: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TO, cb), lambda o: (o, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TO, nd), lambda o: (o, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, codes, d]
    if has_sc:
        in_specs.append(pl.BlockSpec((TO, nsub), lambda o: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(sc)
    if has_dmin:
        in_specs.append(pl.BlockSpec((TO, nd), lambda o: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(dmin)
    if has_mn:
        in_specs.append(pl.BlockSpec((TO, nsub), lambda o: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mn)

    kernel = _make_kernel(meta, B, TO, in_features)
    flops = 2 * B * in_features * out_features
    bytes_accessed = (codes.size + d.size * 4
                      + (sc.size if has_sc else 0)
                      + (dmin.size * 4 if has_dmin else 0)
                      + (mn.size if has_mn else 0)
                      + B * in_features * 2 + B * out_features * 4)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, TO), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_features), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(*args)


def pallas_quant_matmul(w: QuantLinear, x: jax.Array) -> jax.Array:
    """x (..., in) -> (..., out).  Falls back to XLA when shapes don't tile."""
    in_f, out_f = w.in_features, w.out_features
    lead = x.shape[:-1]
    B = 1
    for s in lead:
        B *= s

    cb_per_row = in_f * w.bits // 8
    TO = _pick_tile(out_f, in_f, cb_per_row)
    if TO == 0 or in_f % _LANE or B > 1024:
        return w.matmul_xla(x)

    # reorder activation features into the weight's block-minor order
    # (a cheap XLA transpose, fused with surrounding ops)
    x2 = w.permute_activations(x).reshape(B, in_f)
    # pad rows to the bf16 sublane multiple
    Bp = max(8, (B + 7) // 8 * 8)
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    x2 = x2.astype(jnp.bfloat16)

    meta = (w.fmt, w.bits, w.sub_size, w.d_size, w.code_bias,
            w.sc is not None, w.dmin is not None, w.mn is not None,
            w.sc is not None and w.sc.dtype == jnp.int8)
    shapes = (Bp, in_f, out_f, TO)
    interpret = jax.devices()[0].platform != "tpu"
    out = _quant_matmul_2d(x2, w.codes, w.d, w.sc, w.dmin, w.mn,
                           meta=meta, shapes=shapes, interpret=interpret)
    if Bp != B:
        out = out[:B]
    return out.reshape(*lead, out_f).astype(x.dtype)
