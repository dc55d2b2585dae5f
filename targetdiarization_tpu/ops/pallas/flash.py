"""Fused FLASH grouped quadratic attention (Pallas TPU kernel).

MossFormer2's hot op (SURVEY.md §7.2 step 7): per group of `g` frames,

    A = relu(Q Kᵀ / g)² ⊙ mask          (g, g)
    out_v = A V ;  out_u = A U          (g, e)

Under plain XLA the (B·G, g, g) attention tensor round-trips through HBM
between the two matmuls. This kernel keeps A in VMEM: one grid step per
(batch·group) computes Q Kᵀ on the MXU, applies relu²+mask on the VPU,
and immediately contracts against BOTH V and U — A is never written out.
With the production shapes (g=256, d_qk=128, e=1024) the working set is
~3.3 MB of VMEM, well under the ~16 MB budget, and every matmul is a
multiple of the 128×128 MXU tile.

`flash_group_attention` auto-selects: real Pallas on TPU, interpreter
mode elsewhere (exact same kernel semantics, used by CPU CI), and the
jnp reference implementation is exported for equivalence tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def flash_group_attention_reference(q, k, v, u, mask):
    """jnp reference: q,k (B,G,g,d); v,u (B,G,g,e); mask (B,G,1,g)."""
    g = q.shape[-2]
    sim = jnp.einsum("bgid,bgjd->bgij", q, k) / g
    attn = jnp.square(jax.nn.relu(sim)) * mask
    out_v = jnp.einsum("bgij,bgje->bgie", attn, v)
    out_u = jnp.einsum("bgij,bgje->bgie", attn, u)
    return out_v, out_u


def flash_gated_attention_reference(q, k, v, u, mask, lq, lin_kv, lin_ku):
    """jnp reference for the fully fused FLASH epilogue.

    Combines the quadratic intra-group attention with the global linear
    term and the output gate (mossformer_block.py FLASH_ShareA_FFConvM
    att_v/att_u → gating):

        out = (quad_u + lq·lin_ku) ⊙ v ⊙ σ((quad_v + lq·lin_kv) ⊙ u)

    q, k, lq: (B, G, g, d); v, u: (B, G, g, e); mask: (B, G, 1, g);
    lin_kv, lin_ku: (B, d, e) — the already-normalized global kv
    summaries. Returns out: (B, G, g, e).
    """
    qv, qu = flash_group_attention_reference(q, k, v, u, mask)
    lin_v = jnp.einsum("bgnd,bde->bgne", lq, lin_kv)
    lin_u = jnp.einsum("bgnd,bde->bgne", lq, lin_ku)
    att_v = qv + lin_v
    att_u = qu + lin_u
    return (att_u * v) * jax.nn.sigmoid(att_v * u)


def _gated_kernel(q_ref, k_ref, v_ref, u_ref, mask_ref, lq_ref,
                  kv_ref, ku_ref, out_ref):
    # one grid step per (batch, group); blocks carry leading singletons
    g = q_ref.shape[2]
    q, k = q_ref[0, 0], k_ref[0, 0]       # (g, d)
    v, u = v_ref[0, 0], u_ref[0, 0]       # (g, e)
    m = mask_ref[0, 0]                    # (1, g)
    lq = lq_ref[0, 0]                     # (g, d)
    kv, ku = kv_ref[0], ku_ref[0]         # (d, e)
    sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (1.0 / g)
    attn = (jnp.square(jnp.maximum(sim, 0.0)) * m).astype(v.dtype)
    att_v = jnp.dot(attn, v, preferred_element_type=jnp.float32) + \
        jnp.dot(lq, kv, preferred_element_type=jnp.float32)
    att_u = jnp.dot(attn, u, preferred_element_type=jnp.float32) + \
        jnp.dot(lq, ku, preferred_element_type=jnp.float32)
    vf = v.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    out = (att_u * vf) * jax.nn.sigmoid(att_v * uf)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _gated_pallas(q, k, v, u, mask, lq, lin_kv, lin_ku,
                  interpret: bool = False):
    b, n_groups, g, d = q.shape
    e = v.shape[-1]
    mask = jnp.broadcast_to(mask, (b, n_groups, 1, g))

    def idx(bi, gi):
        return (bi, gi, 0, 0)

    def idx_b(bi, gi):
        return (bi, 0, 0)

    isz = q.dtype.itemsize
    (out,) = pl.pallas_call(
        _gated_kernel,
        grid=(b, n_groups),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, e), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, e), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, g), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, e), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, e), idx_b, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, g, e), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, n_groups, g, e), v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_groups * g * (g * d + 2 * g * e + 2 * d * e),
            bytes_accessed=isz * b * n_groups * g * (3 * d + 3 * e + 1),
            transcendentals=b * n_groups * g * e,  # the sigmoid
        ),
        interpret=interpret,
    )(q, k, v, u, mask, lq, lin_kv, lin_ku)
    return out


@jax.custom_vjp
def _gated_fused(q, k, v, u, mask, lq, lin_kv, lin_ku):
    """Fused quad+linear+gate forward (Pallas); reference-formulation
    backward (same rationale and precision note as _flash_fused)."""
    interpret = jax.default_backend() != "tpu"
    return _gated_pallas(q, k, v, u, mask, lq, lin_kv, lin_ku,
                         interpret=interpret)


def _gated_fwd(q, k, v, u, mask, lq, lin_kv, lin_ku):
    out = _gated_fused(q, k, v, u, mask, lq, lin_kv, lin_ku)
    return out, (q, k, v, u, mask, lq, lin_kv, lin_ku)


def _gated_bwd(res, grad):
    q, k, v, u, mask, lq, lin_kv, lin_ku = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, u_, lq_, kv_, ku_: flash_gated_attention_reference(
            q_, k_, v_, u_, mask, lq_, kv_, ku_),
        q, k, v, u, lq, lin_kv, lin_ku)
    dq, dk, dv, du, dlq, dkv, dku = vjp(grad)
    return dq, dk, dv, du, None, dlq, dkv, dku


_gated_fused.defvjp(_gated_fwd, _gated_bwd)


def flash_gated_attention(q, k, v, u, mask, lq, lin_kv, lin_ku,
                          use_pallas: bool | None = None):
    """Fully fused FLASH attention epilogue: quadratic + linear + gate.

    One kernel writes only the gated output — the quad_v/quad_u,
    lin_v/lin_u, and att_v/att_u intermediates (each (B, T, e), the
    widest activations in the block) never touch HBM. At the production
    separator geometry this removes ~6 full-width tensor round-trips
    per layer vs the two-output kernel + XLA epilogue.

    use_pallas: None = auto (Pallas on TPU, jnp elsewhere);
    True on non-TPU runs the kernel in interpreter mode (tests).
    Differentiable either way (custom VJP via the reference formulation).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _gated_fused(q, k, v, u, mask, lq, lin_kv, lin_ku)
    return flash_gated_attention_reference(q, k, v, u, mask, lq,
                                           lin_kv, lin_ku)


def _kernel(q_ref, k_ref, v_ref, u_ref, mask_ref, outv_ref, outu_ref):
    # block shapes carry a leading singleton (one grid step per group)
    g = q_ref.shape[1]
    q, k = q_ref[0], k_ref[0]           # (g, d)
    v, u = v_ref[0], u_ref[0]           # (g, e)
    m = mask_ref[0]                     # (1, g) → broadcasts over rows
    sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (1.0 / g)
    attn = (jnp.square(jnp.maximum(sim, 0.0)) * m).astype(v.dtype)  # in VMEM
    # accumulate f32 on the MXU, store in the input dtype (bf16 inputs →
    # half the output HBM traffic)
    outv_ref[0] = jnp.dot(attn, v, preferred_element_type=jnp.float32
                          ).astype(outv_ref.dtype)
    outu_ref[0] = jnp.dot(attn, u, preferred_element_type=jnp.float32
                          ).astype(outu_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _flash_pallas(q, k, v, u, mask, interpret: bool = False):
    b, n_groups, g, d = q.shape
    e = v.shape[-1]
    bg = b * n_groups
    qf = q.reshape(bg, g, d)
    kf = k.reshape(bg, g, d)
    vf = v.reshape(bg, g, e)
    uf = u.reshape(bg, g, e)
    mf = jnp.broadcast_to(mask, (b, n_groups, 1, g)).reshape(bg, 1, g)

    grid = (bg,)

    def idx(i):
        return (i, 0, 0)

    out_v, out_u = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, g, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, e), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, e), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g, e), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, e), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bg, g, e), v.dtype),
            jax.ShapeDtypeStruct((bg, g, e), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bg * (g * g * d + 2 * g * g * e),
            bytes_accessed=4 * bg * (2 * g * d + 4 * g * e + g),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qf, kf, vf, uf, mf)
    return out_v.reshape(b, n_groups, g, e), out_u.reshape(b, n_groups, g, e)


@jax.custom_vjp
def _flash_fused(q, k, v, u, mask):
    """Pallas forward with a reference-formulation backward (pallas_call
    has no automatic VJP; the jnp gradient is mathematically exact for
    the same primal).

    Precision note: with bf16 inputs the forward downcasts the attention
    matrix to bf16 before the V/U matmuls and stores bf16 outputs (half
    the HBM traffic; measured speed tie with f32 attn at 1.03 vs
    1.05 ms), while the backward recomputes gradients from the f32
    reference formulation — a small primal/backward numeric mismatch.
    Acceptable for inference and for the bootstrap-scale training here;
    pass f32 inputs (TD_COMPUTE_DTYPE=float32) to remove it."""
    interpret = jax.default_backend() != "tpu"
    return _flash_pallas(q, k, v, u, mask, interpret=interpret)


def _flash_fwd(q, k, v, u, mask):
    return _flash_fused(q, k, v, u, mask), (q, k, v, u, mask)


def _flash_bwd(res, grads):
    q, k, v, u, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, u_: flash_group_attention_reference(
            q_, k_, v_, u_, mask),
        q, k, v, u)
    dq, dk, dv, du = vjp(grads)
    return dq, dk, dv, du, None


_flash_fused.defvjp(_flash_fwd, _flash_bwd)


def flash_group_attention(q, k, v, u, mask, use_pallas: bool | None = None):
    """Grouped relu² attention with shared A applied to V and U.

    q, k: (B, G, g, d); v, u: (B, G, g, e); mask: (B, G, 1, g).
    use_pallas: None = auto (Pallas on TPU, jnp elsewhere);
    True on non-TPU runs the kernel in interpreter mode (tests).
    Differentiable either way (custom VJP via the reference formulation).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _flash_fused(q, k, v, u, mask)
    return flash_group_attention_reference(q, k, v, u, mask)
