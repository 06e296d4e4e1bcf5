"""Linear-layer weight containers: dense bf16 or quantized-resident.

The TPU-native replacement for llama.cpp's per-quant-type dequant+matmul CUDA
kernels (delegated by the reference to the llama-server binary, SURVEY.md
§2.9).  Design:

- weights live in HBM in a *repacked* dense layout per format family —
  power-of-two bitfield codes plus a (super-block scale, sub-block int8
  scale/min) hierarchy — chosen so in-kernel unpacking is pure shift/mask on
  the VPU and the MXU sees large bf16 tiles;
- every container is a pytree, so the same model code works dense or
  quantized, on CPU (XLA fallback) or TPU (Pallas kernels in
  ``ops.matmul_kernels``), and shards with jax.sharding partition specs along
  the out-features axis (keeps quant blocks intact, SURVEY.md §7 step 7).

``matmul(w, x)`` computes ``x @ W.T`` for x: (..., in) -> (..., out).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np



# Formats whose stored codes are INDICES into a fixed dequant alphabet
# rather than (biased) element values.  The alphabets are tiny and fixed
# ABI (quant.iq_grids.GRID_SPECS), so the lookup is pure arithmetic — it
# runs identically under numpy, XLA, and inside Pallas kernel bodies.
MAPPED_FMTS = frozenset(
    ("iq2_xxs", "iq2_xs", "iq2_s", "iq3_xxs", "iq3_s"))


def code_values(fmt: str, q):
    """Unpacked integer codes -> integer element values (identity for most).

    IQ2/IQ3 codes are sign|magnitude: bit 3 = sign, low bits index the
    magnitude alphabet {8, 25, 43, 59} (iq2: 17c + 8 + (c==2)) or
    {4, 12, ..., 52, 62} (iq3: 8c + 4 + 2*(c==7)).  Negation is the
    two's-complement identity -x == (x ^ -1) + 1, vectorized as
    (m ^ neg) - neg with neg = -sign in {0, -1}.

    MULTIPLY-FREE on purpose: inside Pallas this runs full-width on the
    VPU, where an i32 multiply lowers to a multi-op sequence — measured
    3x kernel slowdown (r4 probe) — while shifts/adds are single-slot.
    """
    if fmt in ("iq2_xxs", "iq2_xs", "iq2_s"):
        # signed-alphabet affine code (quant.iq_ref._IQ2_CODE_OF): the
        # stored code c satisfies 2v == 17*(c & 14) - 2*(c & 1) - 118 for
        # every value in ±{8, 25, 43, 59}; repack halves the stored d so
        # the doubled plane decodes bit-exactly.  7 ops, sign included —
        # no separate negate chain.
        e = q & 14
        return ((e << 4) + e) - ((q & 1) << 1) - 118
    if fmt in ("iq3_xxs", "iq3_s"):
        c = q & 7
        m = (c << 3) + 4 + ((((c + 1) >> 3) & 1) << 1)  # 8c + 4 + 2(c==7)
    else:
        return q
    neg = -(q >> 3)
    return (m ^ neg) - neg


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls) if f.metadata.get("pytree", True)]
    static = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("pytree", True)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=static)
    return cls


def static_field(**kw):
    return dataclasses.field(metadata={"pytree": False}, **kw)


@_register
@dataclasses.dataclass
class DenseLinear:
    """Plain bf16/f32 weight, shape (out, in)."""

    w: jax.Array
    out_features: int = static_field(default=0)
    in_features: int = static_field(default=0)

    @staticmethod
    def from_f32(w: np.ndarray, dtype=jnp.bfloat16) -> "DenseLinear":
        o, i = w.shape
        return DenseLinear(w=jnp.asarray(w, dtype=dtype), out_features=o, in_features=i)

    def matmul(self, x: jax.Array, out_dtype=None) -> jax.Array:
        return jax.lax.dot_general(
            x, self.w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype or x.dtype)

    def dequantize(self) -> jax.Array:
        return self.w


@_register
@dataclasses.dataclass
class QuantLinear:
    """Quantized-resident weight in the repacked TPU layout.

    Decode rule (vectorized over the whole tensor):

        w[o, i] = d[o, sb(i)] * sc[o, b(i)] * q[o, i] - dmin[o, sb(i)] * mn[o, b(i)]

    where ``sb(i) = i // QK_K`` indexes super-blocks, ``b(i) = i // sub_size``
    sub-blocks.  ``q`` comes from ``codes`` by shift/mask (bits ∈ {2,4,8}) and
    subtracting ``code_bias``.  Symmetric formats have ``dmin``/``mn`` = None.

    Repacked forms of the GGML wire formats (converted at load time from the
    mmap'd file by ``quant.repack``):

    ==========  ====  =========  ====================================
    fmt         bits  sub_size   scale hierarchy
    ==========  ====  =========  ====================================
    q8_0        8     32         d: f32 per 32 (sc == 1)
    q4_0        4     32         d: f32 per 32, bias 8
    q4_1        4     32         d + dmin: f32 per 32 (mn == 1)
    q5_0/q5_1   8     32         repacked to int8 codes
    q4_k        4     32         d,dmin f32 / 256; sc,mn u8 / 32
    q5_k        8     32         same hierarchy, int8 codes
    q6_k        8     16         d f32 / 256; sc i8 / 16, bias 32
    q3_k        4     16         d f32 / 256; sc i8 / 16, bias 4
    q2_k        2     16         d,dmin f32 / 256; sc,mn u8 / 16
    iq4_nl/xs   8     32/256     codebook applied at repack -> int8
    iq2_*/iq3_* 8     16/32      decoded int8 VALUES (default, fastest);
                                 d f32 / 256, sc u8 odd per sub
    iq2_*/iq3_* 4     16/32      LGT_IQ_CODES=packed4: sign|mag codes
                                 (code_values map) at min footprint
    iq1_s/m     2     32/8       trit codes, bias 1; d,dmin f32 / 256;
                                 sc u8, mn i8 per sub (delta term)
    ==========  ====  =========  ====================================
    """

    codes: jax.Array                     # packed codes, (out, in * bits // 8) uint8 or (out, in) int8
    d: jax.Array                         # (out, in // d_size) f32
    sc: jax.Array | None                 # (out, in // sub_size) int8/uint8 sub-scales or None
    dmin: jax.Array | None               # (out, in // d_size) f32
    mn: jax.Array | None                 # (out, in // sub_size) uint8
    fmt: str = static_field(default="q8_0")
    bits: int = static_field(default=8)
    sub_size: int = static_field(default=32)    # elements per sub-block (sc/mn granularity)
    d_size: int = static_field(default=32)      # elements per super-block (d/dmin granularity)
    code_bias: int = static_field(default=0)    # subtract from unpacked code
    out_features: int = static_field(default=0)
    in_features: int = static_field(default=0)
    # MIXED layout (quant.repack.mixed_repacked): dmin granularity when it
    # differs from d's — dmin is (out, in // min_size) f32 per min
    # super-block and mn (out, in // sub_size) per sub in the compact
    # (s, σ) column order, while d is the FLAT effective scale.  0 = min
    # arrays share d_size (flat/compact layouts).
    min_size: int = static_field(default=0)

    # -- decode (XLA reference path; Pallas kernels mirror this exactly) ----
    #
    # Elements are stored in BLOCK-MINOR order (quant.repack.block_minor_perm):
    # stored position j = t*(g*nd) + s*nd + σ holds logical element
    # σ*d_size + s*sub_size + t.  Every per-block scale expansion is then a
    # tile (``full[j] = arr[j mod n]``) — the only expansion Mosaic lowers
    # natively — and activations get the matching cheap transpose.

    @property
    def _geom(self) -> tuple[int, int, int]:
        """(nd, g, sub): super-blocks per row, subs per super, sub size."""
        nd = self.in_features // self.d_size
        g = self.d_size // self.sub_size
        return nd, g, self.sub_size

    def permute_activations(self, x: jax.Array) -> jax.Array:
        """Reorder x's feature axis into the weight's block-minor order."""
        nd, g, sub = self._geom
        lead = x.shape[:-1]
        x4 = x.reshape(*lead, nd, g, sub)
        perm = tuple(range(len(lead))) + tuple(
            len(lead) + a for a in (2, 1, 0))
        return x4.transpose(*perm).reshape(*lead, self.in_features)

    def _unpack_codes_bm(self) -> jax.Array:
        """Integer codes (out, in) in block-minor order, int32 minus bias."""
        o, i = self.out_features, self.in_features
        if self.bits == 8:
            q = self.codes.astype(jnp.int32)
        elif self.bits == 4:
            # planar split: low nibbles = stored [0, in/2), high = [in/2, in)
            b = self.codes.astype(jnp.int32)          # (out, in//2)
            q = jnp.concatenate([b & 0x0F, b >> 4], axis=1)
        elif self.bits == 2:
            b = self.codes.astype(jnp.int32)          # (out, in//4)
            q = jnp.concatenate([b & 3, (b >> 2) & 3, (b >> 4) & 3,
                                 (b >> 6) & 3], axis=1)
        else:
            raise NotImplementedError(f"bits={self.bits}")
        if self.bits == 4:
            # the sign|magnitude map applies only to 4-bit IQ codes; the
            # int8 layout of the same fmts stores decoded VALUES directly
            q = code_values(self.fmt, q)
        return q - self.code_bias

    def _scale_full_bm(self, arr_d, arr_sc) -> jax.Array:
        """(out, in) per-element scale in block-minor order via tiles."""
        nd, g, sub = self._geom
        s = jnp.tile(arr_d, (1, g))                    # (out, g*nd): d[σ]
        if arr_sc is not None:
            s = s * arr_sc.astype(jnp.int32).astype(jnp.float32)
        return jnp.tile(s, (1, sub))                   # (out, in)

    def _min_sub_mixed(self) -> jax.Array:
        """Mixed layout: per-sub-block min term (out, nsub) in the FLAT
        σ' = σ*g + s column order (matching d and the stored codes)."""
        o = self.out_features
        g = self.min_size // self.sub_size
        ndm = self.in_features // self.min_size
        m = jnp.repeat(self.dmin, g, axis=1)              # σ-major expand
        mn_p = (self.mn.reshape(o, g, ndm).transpose(0, 2, 1)
                .reshape(o, ndm * g))                     # (s,σ) -> σ' order
        return m * mn_p.astype(jnp.int32).astype(jnp.float32)

    def dequantize_bm(self, dtype=jnp.bfloat16) -> jax.Array:
        """Dequant to (out, in) in block-minor column order."""
        q = self._unpack_codes_bm().astype(jnp.float32)
        w = q * self._scale_full_bm(self.d, self.sc)
        if self.dmin is not None:
            if self.min_size:
                w = w - jnp.tile(self._min_sub_mixed(), (1, self.sub_size))
            else:
                w = w - self._scale_full_bm(self.dmin, self.mn)
        return w.astype(dtype)

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """Full dequant to (out, in) in LOGICAL column order (test/golden path)."""
        nd, g, sub = self._geom
        w = self.dequantize_bm(dtype)
        # invert the block-minor permutation: stored (t, s, σ) -> logical (σ, s, t)
        return (w.reshape(self.out_features, sub, g, nd)
                .transpose(0, 3, 2, 1).reshape(self.out_features, self.in_features))

    def matmul(self, x: jax.Array, out_dtype=None) -> jax.Array:
        from .matmul_kernels import quant_matmul
        return quant_matmul(self, x, out_dtype)

    def matmul_xla(self, x: jax.Array, out_dtype=None) -> jax.Array:
        w = self.dequantize_bm(x.dtype)
        xp = self.permute_activations(x)
        return jax.lax.dot_general(
            xp, w,
            dimension_numbers=(((xp.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype or x.dtype)


@_register
@dataclasses.dataclass
class LoraLinear:
    """Low-rank adapter riding a base weight (llama-server ``--lora``,
    reference EXTRA_ARGS passthrough ``start.sh:490-494``):

        y = base(x) + scale * (x @ A.T) @ B.T

    with A (r, in), B (out, r) from a GGUF adapter file and
    ``scale = user_scale * alpha / r`` (llama.cpp convention).  The base
    stays quantized-resident (Pallas kernel path untouched); the rank-r
    matmuls are FLOP/bandwidth-negligible and ride XLA.  ``fuse_linears``
    deliberately rejects wrapped weights, so adapted projections stay
    un-fused."""

    base: DenseLinear | QuantLinear
    a: jax.Array                         # (r, in)
    b: jax.Array                         # (out, r)
    scale: float = static_field(default=1.0)

    @property
    def out_features(self) -> int:
        return self.base.out_features

    @property
    def in_features(self) -> int:
        return self.base.in_features

    def matmul(self, x: jax.Array, out_dtype=None) -> jax.Array:
        # base output must stay f32 until the delta lands: when base and
        # delta partially cancel, a bf16 round-trip of y leaves an absolute
        # error of one ulp of |y| — catastrophic relative error in the sum
        # (ggml mul_mat outputs are f32, so llama.cpp has the same property)
        y = self.base.matmul(x, out_dtype=jnp.float32)
        dn = lambda lhs, rhs: jax.lax.dot_general(  # noqa: E731
            lhs, rhs, dimension_numbers=(((lhs.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = dn(dn(x, self.a), self.b.astype(jnp.float32))
        return (y + delta * self.scale).astype(out_dtype or x.dtype)

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        w = self.base.dequantize().astype(jnp.float32)
        merged = w + self.scale * (self.b.astype(jnp.float32)
                                   @ self.a.astype(jnp.float32))
        return merged.astype(dtype)


@_register
@dataclasses.dataclass
class QuantEmbedding:
    """Quantized-RESIDENT token embedding table (r4; VERDICT r3 #8).

    The table is gathered per token, never matmul'd, so rounds 1-3 kept a
    dequantized bf16 copy resident (1.05 GB for an 8B vocab).  Instead:
    keep the repacked QuantLinear arrays (rows = vocab entries, quant
    blocks run along the feature axis) and gather + dequantize only the
    requested ROWS on device — exact wire values (no re-quantization, the
    gathered rows decode through the same rule as the full table) at the
    packed footprint (~6 bpw for Q4_K flat vs 16 bpw bf16).

    llama.cpp's ggml_get_rows on quantized tensors is the same design.
    """

    table: QuantLinear

    @property
    def shape(self) -> tuple[int, int]:
        return (self.table.out_features, self.table.in_features)

    @property
    def dtype(self):
        return jnp.bfloat16

    def take(self, token_ids: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
        """token_ids (...,) int32 -> (..., dim) embeddings.

        The gathered-row sub-table is itself a valid QuantLinear (every
        array shares the leading vocab axis), so decode reuses
        ``dequantize`` verbatim; row count is static per trace (engine
        buckets fix B*T), costing one tiny specialization per shape.
        """
        flat = token_ids.reshape(-1)
        g = lambda a: None if a is None else jnp.take(a, flat, axis=0)  # noqa: E731
        sub = dataclasses.replace(
            self.table, codes=g(self.table.codes), d=g(self.table.d),
            sc=g(self.table.sc), dmin=g(self.table.dmin),
            mn=g(self.table.mn), out_features=int(flat.shape[0]))
        w = sub.dequantize(dtype)
        return w.reshape(*token_ids.shape, self.table.in_features)

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        """Full-table dequant (tests / tied-head fallbacks)."""
        return self.table.dequantize(dtype)


def embed_lookup(tok_embd, token_ids: jax.Array) -> jax.Array:
    """Gather token embeddings from a dense table or a QuantEmbedding."""
    if isinstance(tok_embd, QuantEmbedding):
        return tok_embd.take(token_ids)
    return jnp.take(tok_embd, token_ids, axis=0)


LinearWeight = DenseLinear | QuantLinear | LoraLinear


def matmul(w: LinearWeight, x: jax.Array) -> jax.Array:
    return w.matmul(x)


def fuse_linears(ws: list[LinearWeight]) -> LinearWeight | None:
    """Row-concatenate weights sharing in_features into one linear.

    Quantized rows are independent (blocks run along in_features), so
    concatenating codes/scales along the out axis is exact.  Returns None when
    the weights aren't compatible (mixed formats/geometry) — callers keep
    them separate.  Used to fuse QKV and gate+up projections, cutting kernel
    launches per decode layer (launch overhead is significant at batch 1).
    """
    if all(isinstance(w, DenseLinear) for w in ws):
        if len({w.in_features for w in ws}) != 1:
            return None
        cat = jnp.concatenate([w.w for w in ws], axis=0)
        return DenseLinear(w=cat, out_features=sum(w.out_features for w in ws),
                           in_features=ws[0].in_features)
    if not all(isinstance(w, QuantLinear) for w in ws):
        return None
    w0 = ws[0]
    key = (w0.fmt, w0.bits, w0.sub_size, w0.d_size, w0.code_bias,
           w0.min_size, w0.in_features, w0.sc is None, w0.dmin is None,
           w0.mn is None)
    for w in ws[1:]:
        if (w.fmt, w.bits, w.sub_size, w.d_size, w.code_bias, w.min_size,
                w.in_features, w.sc is None, w.dmin is None,
                w.mn is None) != key:
            return None

    def cat(field):
        vals = [getattr(w, field) for w in ws]
        if vals[0] is None:
            return None
        return jnp.concatenate(vals, axis=0)

    return QuantLinear(
        codes=cat("codes"), d=cat("d"), sc=cat("sc"), dmin=cat("dmin"),
        mn=cat("mn"), fmt=w0.fmt, bits=w0.bits, sub_size=w0.sub_size,
        d_size=w0.d_size, code_bias=w0.code_bias, min_size=w0.min_size,
        out_features=sum(w.out_features for w in ws),
        in_features=w0.in_features,
    )
