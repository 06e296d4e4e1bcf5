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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear import MAPPED_FMTS, QuantLinear, code_values

_LANE = 128


def _variant() -> str:
    """Kernel variant for 4-bit formats (A/B knob, see tools/kernel_bench.py):

    base  — bf16 magic unpack, full-width scale+min expansion (round-1 kernel)
    xsum  — min/bias term moved OFF the hot loop: y = x@(v*s).T - xsum@m'.T
            where xsum[b,σ] = Σ_{k∈σ} x[b,k] rides the MXU as a tiny second
            dot; saves the (TO, in)-wide min expansion + subtract on the VPU
    split — like xsum but dequantizes the low/high nibble planes separately
            into TWO half-width MXU dots (no lane-relayout concat); wins on
            small out_features, loses slightly on large (kernel_bench r2)
    fsplit— planar split in the i32/f32 register domain (the q6_k chain,
            which streams at 94% roofline): no u16 packed ops, no concat.
            The 16-bit ops of base/xsum/split run as packed pairs that
            Mosaic services with (de)interleave relayouts — staying in the
            32-bit register domain beats touching half the bytes
    int8  — Q8_1-style per-32-block int8 activation quantization + integer
            MXU dot per sub-block (codes never expand past int8 width), then
            per-sub-block rescale on the small (nd, B, TO) partials

    Default is fsplit (paired kernel_bench, v5e, compact scales, r2):
    q4_k 14336x4096 fsplit 0.0785 ms vs xsum 0.111 (flat xsum 0.087);
    4096x14336 fsplit 0.0603 ms (70.6% of HBM roofline) vs xsum 0.098.
    int8 currently fails Mosaic compilation on v5e (batched int8 dot).
    """
    return os.environ.get("LGT_MM_VARIANT", "fsplit")


def _pick_tile(out_features: int, in_features: int, code_bytes_per_row: int) -> int:
    """Largest out-tile that divides out_features and fits a VMEM budget.

    The budget counts the UNPACK INTERMEDIATES (~10 B per logical element
    for the 4-bit path: i32 masked halves + u16 concat + bf16 v/s_full/w)
    plus double-buffered packed codes.  Empirically (kernel_bench, marginal
    timing) tile size barely moves throughput on v5e between 128 and 512 —
    its VMEM comfortably fits these — so the default budget just keeps
    worst-case shapes sane.  Override with LGT_MM_TO for A/B sweeps.

    The out-tile must be >= 128 (or the whole out dim): Pallas requires the
    output block's last dimension be a multiple of 128 or the full axis.
    """
    forced = int(os.environ.get("LGT_MM_TO", 0))
    if forced and out_features % forced == 0:
        return forced
    budget = int(os.environ.get("LGT_MM_VMEM_BUDGET", 48 * 1024 * 1024))
    for to in (512, 256, 128):
        if out_features % to:
            continue
        vmem = to * in_features * 10 + to * code_bytes_per_row * 2
        if vmem <= budget:
            return to
    if out_features < 128 or out_features % 128 == 0:
        return out_features if out_features <= 512 else 0
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
     sc_signed, min_size) = meta

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

        if bits == 4 and fmt not in MAPPED_FMTS:
            # bf16 magic-number unpack: for a 4-bit code q, the u16 pattern
            # 0x4300 | q bitcasts to bf16 value (128 + q) exactly.  The 128
            # offset is removed BEFORE scaling (exact bf16 integer subtract);
            # folding it into the min term instead would catastrophically
            # cancel in bf16.  All full-width ops run at u16/bf16 density.
            # shift/mask in i32 (Mosaic legalizes i32 shifts only); drop each
            # half to u16 BEFORE the concat so the lane-relayout copy runs at
            # 2B/elem, not 4B (VMEM pressure: see _pick_tile)
            c32 = codes_ref[:].astype(jnp.int32)                # (TO, in/2)
            q16 = jnp.concatenate([(c32 & 0xF).astype(jnp.uint16),
                                   (c32 >> 4).astype(jnp.uint16)], axis=1)
            v = pltpu.bitcast(q16 | jnp.uint16(0x4300), jnp.bfloat16)
            v = v - jnp.bfloat16(128.0)                          # exact: v = q
            m_sub = m_sub + float(bias) * s_sub                  # fold code bias
        else:
            # 8-bit codes can't ride the bf16 magic (9-bit int range exceeds
            # bf16's 7 mantissa bits) — and the i32/f32 path already streams
            # int8 formats at HBM roofline.  2-bit and value-mapped (IQ
            # packed4 codes) formats also go here; the map applies to
            # 4-bit codes only (int8 IQ layouts store decoded values).
            q = _unpack_planar(codes_ref[:], bits)
            if bits == 4:
                q = code_values(fmt, q)
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
     sc_signed, min_size) = meta
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
        ndm = in_features // (min_size or d_size)   # mixed: min granularity
        in_specs.append(pl.BlockSpec((TO, ndm), lambda o: (o, 0),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------- variants
#
# Post-repack invariants (quant.repack.rw): the scale hierarchy is flattened
# to ONE f32 effective scale (+ min) per sub-block, so d_size == sub_size,
# g == 1, and sc/mn are None.  The variants below rely on that.


def _hier_scales(meta, d_ref, sc_ref, dmin_ref, mn_ref):
    """Per-SUB-block effective scale + min term, (TO, nsub) f32, in VMEM.

    Flat layout (d_size == sub_size, sc/mn None): s_sub = d, m = dmin.
    Compact layout: s_sub = repeat(d, g) * sc and m = repeat(dmin, g) * mn —
    tile expansion over the tiny (TO, nd) arrays (pltpu.repeat matches the
    (s, σ) sub-block order of quant.repack.block_minor_perm).  The code
    bias folds into the min term: w = q*s - (bias*s + m).

    Mixed layout (min_size > 0): s_sub comes flat (σ' column order, rides
    the hot chain untouched); the min term expands hierarchically in the
    compact (s, σ) order — legal because it ONLY feeds the xsum dot, whose
    activation block sums the caller permutes to the same order (code bias
    is zero for mixed formats, so no cross-order fold exists).
    """
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed, min_size) = meta
    g = d_size // sub_size
    s_sub = d_ref[:]                                       # (TO, nd) f32
    if g > 1:
        s_sub = pltpu.repeat(s_sub, g, axis=1)             # (TO, nsub)
    if sc_ref is not None:
        s_sub = s_sub * sc_ref[:].astype(jnp.int32).astype(jnp.float32)
    if min_size:
        gm = min_size // sub_size
        m_sub = pltpu.repeat(dmin_ref[:], gm, axis=1)      # (s, σ) order
        m_sub = m_sub * mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        return s_sub, m_sub
    m_sub = float(bias) * s_sub
    if dmin_ref is not None:
        m = dmin_ref[:]
        if g > 1:
            m = pltpu.repeat(m, g, axis=1)
        if mn_ref is not None:
            m = m * mn_ref[:].astype(jnp.int32).astype(jnp.float32)
        m_sub = m_sub + m
    return s_sub, m_sub


def _make_kernel_xsum(meta: tuple, B: int, TO: int, in_features: int):
    """bits==4 kernel with the min/bias term as a second (tiny) MXU dot.

    y[b, o] = Σ_k x[b,k] * (q[o,k] * s[o, σ(k)])  -  Σ_σ xsum[b,σ] * m'[o,σ]

    with m' = m + bias*s computed once per tile on the small (TO, nsub)
    arrays.  Removes the (TO, in)-wide min expansion + subtract from the
    round-1 kernel — the VPU streams only unpack + one bf16 multiply.
    The min term is MORE precise than round 1 (f32 MXU dot, not bf16 FMA).
    """
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed, min_size) = meta

    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        xsum_ref = refs[idx]; idx += 1
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

        s_sub, m_sub = _hier_scales(meta, d_ref, sc_ref, dmin_ref, mn_ref)

        c32 = codes_ref[:].astype(jnp.int32)               # (TO, in/2)
        q16 = jnp.concatenate([(c32 & 0xF).astype(jnp.uint16),
                               (c32 >> 4).astype(jnp.uint16)], axis=1)
        v = pltpu.bitcast(q16 | jnp.uint16(0x4300), jnp.bfloat16)
        v = v - jnp.bfloat16(128.0)                        # exact: v = q
        s_full = pltpu.repeat(s_sub.astype(jnp.bfloat16), sub_size, axis=1)
        w = v * s_full                                     # (TO, in) bf16

        y = jax.lax.dot_general(
            x_ref[:], w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_min = jax.lax.dot_general(
            xsum_ref[:], m_sub,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y - y_min

    return kernel


def _make_kernel_split(meta: tuple, B: int, TO: int, in_features: int):
    """bits==4 kernel with NO unpack concat: two half-width MXU dots.

    The planar pack stores elements [0, in/2) in low nibbles and
    [in/2, in) in high nibbles, and block-minor order puts the first half
    of every sub-block in the low plane — so each plane's scale expansion
    is still a clean ``pltpu.repeat(s, sub/2)`` tile.  Dequantizing each
    plane separately removes the lane-relayout copy the concat cost
    (kernel_bench r2: xsum 465 GB/s vs q6_k's concat-free 760 GB/s — the
    relayout was the remaining 4-bit gap).  Min/bias handled like xsum.
    """
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed, min_size) = meta
    h = in_features // 2

    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        xsum_ref = refs[idx]; idx += 1
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

        s_sub, m_sub = _hier_scales(meta, d_ref, sc_ref, dmin_ref, mn_ref)

        c32 = codes_ref[:].astype(jnp.int32)               # (TO, in/2)
        vlo = pltpu.bitcast((c32 & 0xF).astype(jnp.uint16)
                            | jnp.uint16(0x4300), jnp.bfloat16)
        vhi = pltpu.bitcast((c32 >> 4).astype(jnp.uint16)
                            | jnp.uint16(0x4300), jnp.bfloat16)
        off = jnp.bfloat16(128.0)
        sh = pltpu.repeat(s_sub.astype(jnp.bfloat16), sub_size // 2, axis=1)
        y = jax.lax.dot_general(
            x_ref[:, :h], (vlo - off) * sh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + jax.lax.dot_general(
            x_ref[:, h:], (vhi - off) * sh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_min = jax.lax.dot_general(
            xsum_ref[:], m_sub,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y - y_min

    return kernel


def _make_kernel_fsplit(meta: tuple, B: int, TO: int, in_features: int):
    """bits==4 kernel: planar split in the i32/f32 domain (q6_k's chain).

    The q6_k int8 kernel streams at 94% of HBM roofline with the chain
    widen -> f32 convert -> multiply -> bf16 narrow, all in the 32-bit
    register domain.  The bf16-magic kernels (xsum/split) run their unpack
    in 16-bit packed ops, which Mosaic services with (de)interleave
    relayouts.  This variant applies the q6_k chain to each 4-bit plane:
    no u16 ops, no concat — two half-width f32 dequants feeding two MXU
    dots.  Min/bias via the exact xsum dot like the other variants.
    """
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed, min_size) = meta
    h = in_features // 2

    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        xsum_ref = refs[idx]; idx += 1
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

        s_sub, m_sub = _hier_scales(meta, d_ref, sc_ref, dmin_ref, mn_ref)

        c32 = codes_ref[:].astype(jnp.int32)               # (TO, in/2)
        sh = pltpu.repeat(s_sub, sub_size // 2, axis=1)    # (TO, in/2) f32
        # mapped (IQ codebook) formats decode codes -> values here in the
        # same i32 register domain; identity for plain 4-bit formats
        wlo = (code_values(fmt, c32 & 0xF).astype(jnp.float32)
               * sh).astype(jnp.bfloat16)
        whi = (code_values(fmt, c32 >> 4).astype(jnp.float32)
               * sh).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            x_ref[:, :h], wlo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + jax.lax.dot_general(
            x_ref[:, h:], whi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_min = jax.lax.dot_general(
            xsum_ref[:], m_sub,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y - y_min

    return kernel


def _make_kernel_qsplit(meta: tuple, B: int, TO: int, in_features: int):
    """bits==2 kernel: planar QUARTER split in the i32/f32 domain.

    The fsplit recipe (two half-width dots, no concat/relayout) extended to
    2-bit codes: the planar-quarters pack (quant.repack._pack2) stores
    elements [i*in/4, (i+1)*in/4) in bit-pair i, and block-minor order makes
    each quarter's scale expansion a clean ``pltpu.repeat(s, sub/4)`` tile
    (needs sub_size % 4 == 0 — q2_k 16, iq1_s 32, iq1_m 8 all qualify).
    Four quarter-width MXU dots; min/bias via the exact xsum dot.  This is
    what lets 2-bit formats stream at ~2 bpw instead of the widened-int8
    8 bpw of rounds 1-3 (VERDICT r3 #1).
    """
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed, min_size) = meta
    qt = in_features // 4

    def kernel(*refs):
        idx = 0
        x_ref = refs[idx]; idx += 1
        xsum_ref = refs[idx]; idx += 1
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

        s_sub, m_sub = _hier_scales(meta, d_ref, sc_ref, dmin_ref, mn_ref)

        c32 = codes_ref[:].astype(jnp.int32)               # (TO, in/4)
        sq = pltpu.repeat(s_sub, sub_size // 4, axis=1)    # (TO, in/4) f32
        y = None
        for i in range(4):
            plane = code_values(fmt, (c32 >> (2 * i)) & 3)
            w = (plane.astype(jnp.float32) * sq).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                x_ref[:, i * qt:(i + 1) * qt], w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = part if y is None else y + part
        y_min = jax.lax.dot_general(
            xsum_ref[:], m_sub,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y - y_min

    return kernel


def _make_kernel_int8(meta: tuple, B: int, TO: int, in_features: int):
    """bits==4 kernel with per-sub-block integer MXU dots.

    Codes stay int8-width end to end: unpack is mask/shift/concat only; the
    sub-block partial dots p[σ, b, o] = Σ_t xq[b, σ, t] * q[o, σ, t] run on
    the MXU in int8 (q in [0,15]); scales apply to the small (nd, B, TO)
    partial tensor.  Activations arrive pre-quantized per 32-block (Q8_1
    style: xq int8 + xs f32 per (b, σ)), min/bias term via exact xsum.

    The block-minor storage order (quant.repack.block_minor_perm with g==1)
    makes stored position j = t*nd + σ, so the (TO, in) -> (TO, sub, nd)
    reshape is free and σ is the lane-minor batch dimension.
    """
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed, min_size) = meta
    nd = in_features // sub_size

    def kernel(*refs):
        idx = 0
        xq_ref = refs[idx]; idx += 1       # (B, in) int8, block-minor
        xs_ref = refs[idx]; idx += 1       # (B, nd) f32 activation scales
        xsum_ref = refs[idx]; idx += 1     # (B, nd) f32 exact block sums
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

        s_sub, m_sub = _hier_scales(meta, d_ref, sc_ref, dmin_ref, mn_ref)

        c32 = codes_ref[:].astype(jnp.int32)               # (TO, in/2)
        w8 = jnp.concatenate([c32 & 0xF, c32 >> 4],
                             axis=1).astype(jnp.int8)      # (TO, in)

        w3 = w8.reshape(TO, sub_size, nd)
        x3 = xq_ref[:].reshape(B, sub_size, nd)
        # batched over σ (minor dim), contracting t: (nd, B, TO) int32
        p = jax.lax.dot_general(
            x3, w3,
            dimension_numbers=(((1,), (1,)), ((2,), (2,))),
            preferred_element_type=jnp.int32,
        )
        sT = s_sub.T                                       # (nd, TO) f32
        xsT = xs_ref[:].T                                  # (nd, B)  f32
        y = jnp.sum(p.astype(jnp.float32) * xsT[:, :, None] * sT[:, None, :],
                    axis=0)                                # (B, TO)
        y_min = jax.lax.dot_general(
            xsum_ref[:], m_sub,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = y - y_min

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "shapes", "interpret",
                                             "kern"))
def _quant_matmul_2d_xsum(x, xsum, codes, d, sc, dmin, mn, *, meta, shapes,
                          interpret=False, kern="xsum"):
    (B, in_features, out_features, TO) = shapes
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed, min_size) = meta
    n_tiles = out_features // TO
    cb = codes.shape[1]
    nd = in_features // d_size          # super-blocks per row (d/dmin width)
    nsub = in_features // sub_size      # sub-blocks per row (sc/mn/xsum width)

    in_specs = [
        pl.BlockSpec((B, in_features), lambda o: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, nsub), lambda o: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TO, cb), lambda o: (o, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TO, nd), lambda o: (o, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, xsum, codes, d]
    if has_sc:
        in_specs.append(pl.BlockSpec((TO, nsub), lambda o: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(sc)
    if has_dmin:
        ndm = in_features // (min_size or d_size)   # mixed: min granularity
        in_specs.append(pl.BlockSpec((TO, ndm), lambda o: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(dmin)
    if has_mn:
        in_specs.append(pl.BlockSpec((TO, nsub), lambda o: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mn)

    maker = {"split": _make_kernel_split,
             "fsplit": _make_kernel_fsplit,
             "qsplit": _make_kernel_qsplit}.get(kern, _make_kernel_xsum)
    kernel = maker(meta, B, TO, in_features)
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("meta", "shapes", "interpret"))
def _quant_matmul_2d_int8(xq, xs, xsum, codes, d, sc, dmin, mn, *, meta,
                          shapes, interpret=False):
    (B, in_features, out_features, TO) = shapes
    (fmt, bits, sub_size, d_size, bias, has_sc, has_dmin, has_mn,
     sc_signed, min_size) = meta
    n_tiles = out_features // TO
    cb = codes.shape[1]
    nd = in_features // d_size          # super-blocks per row
    nsub = in_features // sub_size      # sub-blocks per row

    in_specs = [
        pl.BlockSpec((B, in_features), lambda o: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, nsub), lambda o: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, nsub), lambda o: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TO, cb), lambda o: (o, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TO, nd), lambda o: (o, 0), memory_space=pltpu.VMEM),
    ]
    args = [xq, xs, xsum, codes, d]
    if has_sc:
        in_specs.append(pl.BlockSpec((TO, nsub), lambda o: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(sc)
    if has_dmin:
        ndm = in_features // (min_size or d_size)   # mixed: min granularity
        in_specs.append(pl.BlockSpec((TO, ndm), lambda o: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(dmin)
    if has_mn:
        in_specs.append(pl.BlockSpec((TO, nsub), lambda o: (o, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mn)

    kernel = _make_kernel_int8(meta, B, TO, in_features)
    flops = 2 * B * in_features * out_features
    bytes_accessed = (codes.size + d.size * 4
                      + (sc.size if has_sc else 0)
                      + (dmin.size * 4 if has_dmin else 0)
                      + (mn.size if has_mn else 0)
                      + B * in_features + B * out_features * 4)
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


def _block_sums(x2: jax.Array, sub: int) -> jax.Array:
    """(B, in) block-minor activations -> (B, nd) per-sub-block sums, f32."""
    B, in_f = x2.shape
    nd = in_f // sub
    return jnp.sum(x2.astype(jnp.float32).reshape(B, sub, nd), axis=1)


def _quantize_acts(x2: jax.Array, sub: int) -> tuple[jax.Array, jax.Array]:
    """Per-sub-block symmetric int8 activation quantization (Q8_1 style).

    x2 (B, in) block-minor -> (codes int8 (B, in), scales f32 (B, nd)).
    Remember the block-minor layout: block σ's elements sit at positions
    t*nd + σ, so the reshape is (B, sub, nd) with σ minor.
    """
    B, in_f = x2.shape
    nd = in_f // sub
    xb = x2.astype(jnp.float32).reshape(B, sub, nd)
    amax = jnp.max(jnp.abs(xb), axis=1)                     # (B, nd)
    s = amax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s == 0, 1.0, s), 0.0)
    q = jnp.clip(jnp.round(xb * inv[:, None, :]), -127, 127).astype(jnp.int8)
    return q.reshape(B, in_f), s


def pallas_quant_matmul(w: QuantLinear, x: jax.Array, out_dtype=None) -> jax.Array:
    """x (..., in) -> (..., out).  Falls back to XLA when shapes don't tile."""
    in_f, out_f = w.in_features, w.out_features
    lead = x.shape[:-1]
    B = 1
    for s in lead:
        B *= s

    cb_per_row = in_f * w.bits // 8
    TO = _pick_tile(out_f, in_f, cb_per_row)
    # Prefill-sized batches take the Pallas kernels only while the (B, in)
    # activation tile fits a VMEM budget: B=512 x in=14336 blows the 16 MB
    # scoped budget (observed compile OOM), but B=512 x in=4096 (qkv) and
    # B=128 x anything fit fine.  Falling back to XLA costs more than MXU
    # time: the dequant fallback materializes bf16 WEIGHT transients in
    # HBM — ~0.4 GB/layer on an 8B, and XLA's scheduler keeps enough of
    # them alive to ResourceExhaust a 16 GB chip once residency passes
    # ~7 GB (r4: the spec-bench target+draft and MoE prefill OOMs).
    max_b = int(os.environ.get("LGT_MM_MAX_B", 64))
    x_vmem = int(os.environ.get("LGT_MM_X_VMEM", 6 * 1024 * 1024))
    if TO == 0 or in_f % _LANE or (B > max_b and B * in_f * 2 > x_vmem):
        return w.matmul_xla(x, out_dtype)

    # reorder activation features into the weight's block-minor order
    # (a cheap XLA transpose, fused with surrounding ops)
    x2 = w.permute_activations(x).reshape(B, in_f)
    # pad rows to the bf16 sublane multiple
    Bp = max(8, (B + 7) // 8 * 8)
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))

    meta = (w.fmt, w.bits, w.sub_size, w.d_size, w.code_bias,
            w.sc is not None, w.dmin is not None, w.mn is not None,
            w.sc is not None and w.sc.dtype == jnp.int8, w.min_size)
    shapes = (Bp, in_f, out_f, TO)
    interpret = jax.devices()[0].platform != "tpu"

    # variant kernels: 4-bit formats (fsplit family; value-mapped IQ formats
    # force fsplit — the bf16-magic and int8-dot unpacks can't apply the
    # code->value map) and 2-bit formats (qsplit), in either scale layout —
    # flat (sub_size == d_size, sc/mn None) or compact hierarchical (d per
    # super-block + sc/mn per sub-block, expanded in-kernel)
    var = _variant()
    kern = None
    if (in_f % w.sub_size == 0 and w.d_size % w.sub_size == 0
            and (in_f // w.sub_size) % 8 == 0):
        if w.bits == 4 and var in ("xsum", "split", "fsplit", "int8"):
            kern = "fsplit" if w.fmt in MAPPED_FMTS else var
        elif (w.bits == 2 and w.sub_size % 4 == 0 and in_f % 512 == 0
              and var != "base"):
            kern = "qsplit"   # quarter planes must stay lane-aligned (in/4)
    if w.min_size and (kern is None or kern == "int8"):
        # mixed layout is implemented in the xsum-dot family only
        return w.matmul_xla(x, out_dtype)
    if kern is not None:
        if kern == "int8":
            xq, xs = _quantize_acts(x2, w.sub_size)
            xsum = _block_sums(x2, w.sub_size)
            out = _quant_matmul_2d_int8(
                xq, xs, xsum, w.codes, w.d, w.sc, w.dmin, w.mn,
                meta=meta, shapes=shapes, interpret=interpret)
        else:
            xsum = _block_sums(x2, w.sub_size)
            if w.min_size:
                # mixed: the min dot contracts against mn in the compact
                # (s, σ) column order — permute the block sums to match
                # (σ'-order cols σ*g+s -> (s, σ) cols s*ndm+σ)
                gm = w.min_size // w.sub_size
                ndm = in_f // w.min_size
                xsum = (xsum.reshape(Bp, ndm, gm).transpose(0, 2, 1)
                        .reshape(Bp, ndm * gm))
            out = _quant_matmul_2d_xsum(
                x2.astype(jnp.bfloat16), xsum, w.codes, w.d, w.sc, w.dmin,
                w.mn, meta=meta, shapes=shapes, interpret=interpret,
                kern=kern)
        if Bp != B:
            out = out[:B]
        return out.reshape(*lead, out_f).astype(out_dtype or x.dtype)

    x2 = x2.astype(jnp.bfloat16)
    out = _quant_matmul_2d(x2, w.codes, w.d, w.sc, w.dmin, w.mn,
                           meta=meta, shapes=shapes, interpret=interpret)
    if Bp != B:
        out = out[:B]
    return out.reshape(*lead, out_f).astype(out_dtype or x.dtype)
