"""Block-fused Pallas TPU kernels for the CLIP pre-LN transformer.

The r2 fused-qkv attention kernel removed the HBM head-split relayout;
what remains between matmuls on the XLA path is LayerNorm round trips
and large intermediates (the [B, T, 3D] qkv buffer, the [B, T, 4D] MLP
hidden) each paying an HBM write + read. These kernels fuse each half
of the reference's pre-LN resblock (`/root/reference/shared` CLIP
dependency; see models/clip/model.py:179-189 for the block math) into
one VMEM-resident pass per batch block:

* :func:`fused_attn_block` — LN1 (fp32 stats) → fused qkv projection →
  head-pair attention (same row-stacked math as
  ``pallas_attention._fused_qkv_kernel``'s "rows" variant) → output
  projection → residual add. The [B, T, 3D] qkv tensor never exists in
  HBM.
* :func:`fused_mlp_block` — LN2 → fc → QuickGELU → proj → residual.
  The [B, T, 4D] hidden never exists in HBM. Widths whose weight mats
  exceed the VMEM budget (ViT-L/14) route to a d4-chunked grid variant
  that accumulates ``Σ_c gelu(LN(x) @ fc[:,c]) @ proj[c,:]`` in VMEM
  scratch, holding only one weight slice pair per step.

Weights ride as full-block operands with constant index maps, so Mosaic
keeps them resident in VMEM across the batch grid instead of re-copying
per step. Both kernels are differentiable via custom VJPs that
recompute the backward pass through the XLA reference formulation
(rare path — every hot consumer is a frozen tower).

Opt-in via ``attention_impl="block"`` (see model._use_fused_block);
flipped into "auto" only if measured faster than the r2 default.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_ppo_tpu.models.clip.pallas_attention import (
    pair_masks,
    rows_pair_attention,
)


def _ln(x3: jax.Array, g: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    """LayerNorm with fp32 statistics; ``g``/``b`` are [1, D] rows."""
    xf = x3.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    cent = xf - mean
    var = (cent * cent).mean(axis=-1, keepdims=True)
    y = cent * jax.lax.rsqrt(var + eps)
    y = y * g.astype(jnp.float32)[None] + b.astype(jnp.float32)[None]
    return y.astype(x3.dtype)


def _pair_attention(qkv_ref, heads: int, t: int, d_head: int,
                    scale: float, causal: bool) -> jax.Array:
    """Row-stacked head-pair attention on a VMEM scratch ref holding the
    [Bb, T, 3D] qkv projection (the "rows" variant of
    pallas_attention._fused_qkv_kernel; see that kernel for the
    disjoint-lane-mask identity).

    Takes a *ref*, not a value: slicing the staged scratch gives each
    q2/k2/v2 a clean tiled layout, which is what Mosaic's mask broadcast
    supports — the same wheres on lane-slices of the reshaped matmul
    value fail AOT compile with "Not implemented: Sublane broadcast".
    """
    d = heads * d_head
    if d_head * 2 == 128 and heads % 2 == 0:
        # Row-stacked head-pair path: core math shared with the
        # fused-qkv kernel (pallas_attention.rows_pair_attention).
        mlo, mhi, causal_ok = pair_masks(t, d_head, causal)
        outs = []
        for hp in range(heads // 2):
            q2 = qkv_ref[:, :, hp * 128:(hp + 1) * 128]
            k2 = qkv_ref[:, :, d + hp * 128: d + (hp + 1) * 128]
            v2 = qkv_ref[:, :, 2 * d + hp * 128: 2 * d + (hp + 1) * 128]
            outs.append(rows_pair_attention(q2, k2, v2, t, scale, mlo,
                                            mhi, causal_ok))
        return jnp.concatenate(outs, axis=-1).astype(qkv_ref.dtype)
    # generic per-head fallback (d_head != 64)
    if causal:
        rr = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        causal_ok = rr >= cc
    dims = (((2,), (2,)), ((0,), (0,)))
    av_dims = (((2,), (1,)), ((0,), (0,)))
    outs = []
    for h in range(heads):
        q = qkv_ref[:, :, h * d_head:(h + 1) * d_head]
        k = qkv_ref[:, :, d + h * d_head:d + (h + 1) * d_head]
        v = qkv_ref[:, :, 2 * d + h * d_head:2 * d + (h + 1) * d_head]
        s = jax.lax.dot_general(
            q * scale, k, dims, preferred_element_type=jnp.float32
        )
        if causal:
            s = jnp.where(causal_ok, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, v, av_dims, preferred_element_type=jnp.float32
        ))
    return jnp.concatenate(outs, axis=-1).astype(qkv_ref.dtype)


def _attn_block_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                       g_ref, b_ref, o_ref, qkv_scratch, *, heads: int,
                       t: int, d_head: int, scale: float, causal: bool,
                       eps: float):
    bb = x_ref.shape[0]
    d = heads * d_head
    x = x_ref[...]                                    # [Bb, T, D]
    y = _ln(x, g_ref[...], b_ref[...], eps)
    y2 = y.reshape(bb * t, d)
    qkv = jax.lax.dot_general(
        y2, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    # Stage qkv through VMEM scratch: _pair_attention needs ref slices
    # (see its docstring for the Mosaic layout constraint).
    qkv_scratch[...] = qkv.astype(x.dtype).reshape(bb, t, 3 * d)
    attn = _pair_attention(qkv_scratch, heads, t, d_head, scale, causal)
    out = jax.lax.dot_general(
        attn.reshape(bb * t, d), wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[...].astype(jnp.float32)
    o_ref[...] = x + out.astype(x.dtype).reshape(bb, t, d)


def _mlp_block_chunked_kernel(x_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
                              g_ref, b_ref, o_ref, y_scratch, acc_scratch,
                              *, t: int, eps: float, n_chunks: int):
    """d4-chunked MLP block for widths whose weight mats exceed VMEM.

    Grid is (batch_blocks, n_chunks) with the chunk axis innermost; the
    hidden dimension is split so each step holds only a [D, D4/n] slice
    of ``fc`` and the matching [D4/n, D] slice of ``proj``. QuickGELU is
    elementwise in d4, so ``out = Σ_c gelu(LN(x) @ fc[:,c]) @ proj[c,:]``
    accumulates exactly; LN(x) is computed once per batch block (chunk 0)
    and stashed in VMEM scratch."""
    c = pl.program_id(1)
    bb, _, d = x_ref.shape
    x = x_ref[...]

    @pl.when(c == 0)
    def _init():
        y_scratch[...] = _ln(x, g_ref[...], b_ref[...], eps)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    h = jax.lax.dot_general(
        y_scratch[...].reshape(bb * t, d), wfc_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bfc_ref[...].astype(jnp.float32)
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
    acc_scratch[...] += jax.lax.dot_general(
        h, wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c == n_chunks - 1)
    def _finish():
        out = acc_scratch[...] + bproj_ref[...].astype(jnp.float32)
        o_ref[...] = x + out.astype(x.dtype).reshape(bb, t, d)


def _mlp_block_kernel(x_ref, wfc_ref, bfc_ref, wproj_ref, bproj_ref,
                      g_ref, b_ref, o_ref, *, t: int, eps: float):
    bb, _, d = x_ref.shape
    x = x_ref[...]
    y = _ln(x, g_ref[...], b_ref[...], eps)
    h = jax.lax.dot_general(
        y.reshape(bb * t, d), wfc_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc_ref[...].astype(jnp.float32)
    h = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)   # QuickGELU
    out = jax.lax.dot_general(
        h, wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[...].astype(jnp.float32)
    o_ref[...] = x + out.astype(x.dtype).reshape(bb, t, d)


# ---------------------------------------------------------------------------
# XLA reference formulations (shared by the custom-VJP backward passes and
# the interpret-mode parity tests)
# ---------------------------------------------------------------------------


def _ln_ref(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _attn_block_ref(x, wqkv, bqkv, wout, bout, g, b, heads, causal, eps):
    bsz, t, d = x.shape
    dh = d // heads
    y = _ln_ref(x, g[0], b[0], eps)
    qkv = (y.reshape(bsz * t, d) @ wqkv + bqkv.astype(y.dtype))
    qkv = qkv.reshape(bsz, t, 3 * d)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(bsz, t, heads, dh)
    k = k.reshape(bsz, t, heads, dh)
    v = v.reshape(bsz, t, heads, dh)
    logits = jnp.einsum("bqhc,bkhc->bhqk", q / np.sqrt(dh), k)
    if causal:
        logits = logits + jnp.triu(jnp.full((t, t), -jnp.inf), k=1)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bkhc->bqhc", w, v).reshape(bsz * t, d)
    return x + (attn @ wout + bout.astype(x.dtype)).reshape(bsz, t, d)


def _mlp_block_ref(x, wfc, bfc, wproj, bproj, g, b, eps):
    bsz, t, d = x.shape
    y = _ln_ref(x, g[0], b[0], eps)
    h = y.reshape(bsz * t, d) @ wfc + bfc.astype(y.dtype)
    h = h * jax.nn.sigmoid(1.702 * h)
    return x + (h @ wproj + bproj.astype(x.dtype)).reshape(bsz, t, d)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _row(v: jax.Array, dtype) -> jax.Array:
    """[D] param vector → [1, D] VMEM-friendly row in the compute dtype."""
    return v.astype(dtype).reshape(1, -1)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _pick_block(b: int, t: int, d3: int, itemsize: int,
                requested: Optional[int]) -> int:
    if requested is not None:
        return requested
    env = os.environ.get("CLIP_PPO_BLOCK_BATCHES")
    if env:
        return int(env)
    block_bytes = t * d3 * itemsize
    return max(1, min(8, (4 << 20) // block_bytes))


def _blocked_call(kernel, x, weight_ops, block_batches, interpret,
                  scratch_shapes=()):
    """Grid over batch blocks; weights as constant-index full blocks."""
    b, t, d = x.shape
    pad = (-b) % block_batches
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, t, d), x.dtype)], axis=0)
    blocks = (b + pad) // block_batches
    in_specs = [pl.BlockSpec((block_batches, t, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [_full_spec(w.shape) for w in weight_ops]
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_batches, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, t, d), x.dtype),
        scratch_shapes=list(scratch_shapes),
        interpret=interpret,
    )(x, *weight_ops)
    return out[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _attn_block_p(x, wqkv, bqkv, wout, bout, g, b,
                  heads, causal, eps, block_batches, interpret):
    return _attn_block_fwd_impl(x, wqkv, bqkv, wout, bout, g, b,
                                heads, causal, eps, block_batches, interpret)


def _attn_block_fwd_impl(x, wqkv, bqkv, wout, bout, g, b,
                         heads, causal, eps, block_batches, interpret):
    bsz, t, d = x.shape
    scale = 1.0 / np.sqrt(d // heads)
    bb = _pick_block(bsz, t, 3 * d, x.dtype.itemsize, block_batches)
    kernel = functools.partial(
        _attn_block_kernel, heads=heads, t=t, d_head=d // heads,
        scale=scale, causal=causal, eps=eps,
    )
    return _blocked_call(kernel, x, [wqkv, bqkv, wout, bout, g, b],
                         bb, interpret,
                         scratch_shapes=[pltpu.VMEM((bb, t, 3 * d), x.dtype)])


def _attn_block_fwd(x, wqkv, bqkv, wout, bout, g, b,
                    heads, causal, eps, block_batches, interpret):
    out = _attn_block_fwd_impl(x, wqkv, bqkv, wout, bout, g, b,
                               heads, causal, eps, block_batches, interpret)
    return out, (x, wqkv, bqkv, wout, bout, g, b)


def _attn_block_bwd(heads, causal, eps, block_batches, interpret, res, ct):
    x, wqkv, bqkv, wout, bout, g, b = res
    _, vjp = jax.vjp(
        lambda *a: _attn_block_ref(*a, heads=heads, causal=causal, eps=eps),
        x, wqkv, bqkv, wout, bout, g, b,
    )
    return vjp(ct)


_attn_block_p.defvjp(_attn_block_fwd, _attn_block_bwd)


def _mlp_chunked_fwd_impl(x, wfc, bfc, wproj, bproj, g, b,
                          eps, block_batches, interpret):
    bsz, t, d = x.shape
    d4 = wfc.shape[1]
    itemsize = x.dtype.itemsize
    # Smallest power-of-2 chunk count whose weight slices fit the budget.
    # 2 MB (not 8): Mosaic double-buffers BOTH chunk-varying weight
    # slices, and the kernel's fp32 hidden/accumulator temporaries share
    # the same 16 MB scoped-VMEM stack — an 8 MB slice budget compiled to
    # a 20.6 MB scoped allocation for ViT-L/14 (observed OOM on v5e).
    n_chunks = 2
    while (2 * d * (d4 // n_chunks) * itemsize > (2 << 20)
           or d4 % n_chunks) and n_chunks < d4:
        n_chunks *= 2
    ck = d4 // n_chunks
    if block_batches is None:
        env = os.environ.get("CLIP_PPO_MLP_BLOCK_BATCHES")
        if env:
            block_batches = int(env)
        else:
            # x + LN scratch + fp32 acc + out + fp32 hidden chunk per block
            per_bb = t * d * (4 * itemsize + 8)
            block_batches = max(1, min(4, (4 << 20) // per_bb))
    bb = block_batches
    pad = (-bsz) % bb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, t, d), x.dtype)], axis=0)
    blocks = (bsz + pad) // bb
    kernel = functools.partial(_mlp_block_chunked_kernel, t=t, eps=eps,
                               n_chunks=n_chunks)
    out = pl.pallas_call(
        kernel,
        grid=(blocks, n_chunks),
        in_specs=[
            pl.BlockSpec((bb, t, d), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ck), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ck), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ck, d), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, t, d), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz + pad, t, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, t, d), x.dtype),
            pltpu.VMEM((bb * t, d), jnp.float32),
        ],
        interpret=interpret,
    )(x, wfc, bfc, wproj, bproj, g, b)
    return out[:bsz]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _mlp_chunked_p(x, wfc, bfc, wproj, bproj, g, b,
                   eps, block_batches, interpret):
    return _mlp_chunked_fwd_impl(x, wfc, bfc, wproj, bproj, g, b,
                                 eps, block_batches, interpret)


def _mlp_chunked_fwd(x, wfc, bfc, wproj, bproj, g, b,
                     eps, block_batches, interpret):
    out = _mlp_chunked_fwd_impl(x, wfc, bfc, wproj, bproj, g, b,
                                eps, block_batches, interpret)
    return out, (x, wfc, bfc, wproj, bproj, g, b)


def _mlp_stream_kernel(x_ref, wfc_hbm, bfc_ref, wproj_hbm, bproj_ref,
                       g_ref, b_ref, o_ref, y_scratch, acc_scratch,
                       wfc_buf, wproj_buf, sem_fc, sem_pj,
                       *, t: int, eps: float, ck: int, n_chunks: int):
    """Weight-streaming MLP block (VERDICT r3 item 7): ViT-L/14-class
    widths where both weight mats can't stay VMEM-resident. The weights
    live in HBM; [D, ck] fc-tiles and [ck, D] proj-tiles are manually
    double-buffered HBM→VMEM behind the matmuls, and
    ``Σ_c gelu(LN(x) @ fc[:, c]) @ proj[c, :]`` accumulates in an fp32
    scratch — the [Bb·T, 4D] hidden never exists anywhere, and unlike
    the auto-pipelined d4-chunked grid variant (whose weight slices
    re-stream per batch block at its VMEM-forced block_batches=1), the
    activation block here is free of the weight footprint, so bigger
    batch blocks amortize the 2·D·4D weight stream."""
    bb, _, d = x_ref.shape
    x = x_ref[...]
    y_scratch[...] = _ln(x, g_ref[...], b_ref[...], eps).reshape(bb * t, d)
    acc_scratch[...] = jnp.zeros_like(acc_scratch)

    def fc_dma(slot, c):
        return pltpu.make_async_copy(
            wfc_hbm.at[:, pl.ds(c * ck, ck)], wfc_buf.at[slot],
            sem_fc.at[slot])

    def pj_dma(slot, c):
        return pltpu.make_async_copy(
            wproj_hbm.at[pl.ds(c * ck, ck), :], wproj_buf.at[slot],
            sem_pj.at[slot])

    fc_dma(0, 0).start()
    pj_dma(0, 0).start()

    def body(c, _):
        slot = c % 2
        nxt = (c + 1) % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            # slot ``nxt`` was consumed at step c-1; its compute is done
            fc_dma(nxt, c + 1).start()
            pj_dma(nxt, c + 1).start()

        fc_dma(slot, c).wait()
        pj_dma(slot, c).wait()
        h = jax.lax.dot_general(
            y_scratch[...], wfc_buf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bfc_ref[0, pl.ds(c * ck, ck)].astype(jnp.float32)[None]
        h = (h * jax.nn.sigmoid(1.702 * h)).astype(x.dtype)
        acc_scratch[...] += jax.lax.dot_general(
            h, wproj_buf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out = acc_scratch[...] + bproj_ref[...].astype(jnp.float32)
    o_ref[...] = x + out.astype(x.dtype).reshape(bb, t, d)


def _attn_stream_kernel(x_ref, wqkv_hbm, bqkv_ref, wout_ref, bout_ref,
                        g_ref, b_ref, o_ref, y_scratch, qkv_scratch,
                        wq_buf, sem_q, *, heads: int, t: int, d_head: int,
                        scale: float, causal: bool, eps: float, ck: int,
                        n_chunks: int):
    """Weight-streaming attention block (VERDICT r4 item 6): ViT-L/14
    widths where the r4 A/B showed the resident-weight block kernel
    LOSING to fused-qkv (323.8 vs 300.3 ms — the 8 MB qkv+out weights
    squeezed the activation blocks). Here ``wqkv`` stays in HBM and
    [D, ck] column tiles stream double-buffered behind the qkv matmul
    (the r4 MLP-streaming recipe); ``wout`` ([D, D], 2 MB bf16) rides as
    a resident VMEM operand. LN1, the qkv projection, head-pair
    attention, the output projection and the residual all fuse into one
    pass — LN/qkv/attn intermediates never touch HBM."""
    bb, _, d = x_ref.shape
    x = x_ref[...]
    y_scratch[...] = _ln(x, g_ref[...], b_ref[...], eps).reshape(bb * t, d)

    def q_dma(slot, c):
        return pltpu.make_async_copy(
            wqkv_hbm.at[:, pl.ds(c * ck, ck)], wq_buf.at[slot],
            sem_q.at[slot])

    # Python-unrolled chunk loop (n_chunks is small and static): the
    # VMEM lane-slice STORES into qkv_scratch then have static offsets —
    # a traced store offset on the lane dim fails Mosaic compile (the
    # MLP stream kernel never stores to a traced lane slice, it only
    # reads bias slices, which are supported). DMAs stay double-buffered
    # through the two static slots.
    q_dma(0, 0).start()
    for c in range(n_chunks):
        slot = c % 2
        if c + 1 < n_chunks:
            q_dma((c + 1) % 2, c + 1).start()
        q_dma(slot, c).wait()
        col = jax.lax.dot_general(
            y_scratch[...], wq_buf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0, c * ck:(c + 1) * ck].astype(jnp.float32)[None]
        qkv_scratch[:, :, c * ck:(c + 1) * ck] = (
            col.astype(x.dtype).reshape(bb, t, ck))
    attn = _pair_attention(qkv_scratch, heads, t, d_head, scale, causal)
    out = jax.lax.dot_general(
        attn.reshape(bb * t, d), wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[...].astype(jnp.float32)
    o_ref[...] = x + out.astype(x.dtype).reshape(bb, t, d)


def _attn_stream_fwd_impl(x, wqkv, bqkv, wout, bout, g, b,
                          heads, causal, eps, block_batches, interpret):
    bsz, t, d = x.shape
    d3 = wqkv.shape[1]
    itemsize = x.dtype.itemsize
    scale = 1.0 / np.sqrt(d // heads)
    # [D, ck] tile ≤ 1 MB → two slots hold ≤ 2 MB; ck must stay a
    # multiple of 128 lanes for the dynamic lane-slice stores.
    ck = d3
    while ck > 128 and (d * ck * itemsize > (1 << 20) or d3 % ck):
        ck //= 2
    n_chunks = d3 // ck
    if block_batches is None:
        env = os.environ.get("CLIP_PPO_ATTN_STREAM_BB")
        if env:
            block_batches = int(env)
        else:
            # x + y + qkv scratch (3D) + out ≈ 6·T·D·itemsize per batch
            # element, next to the resident wout (D², 2 MB) and the 2 MB
            # of streamed tiles.
            per_b = t * d * 6 * itemsize
            block_batches = max(1, min(8, (8 << 20) // per_b))
    bb = block_batches
    pad = (-bsz) % bb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, t, d), x.dtype)], axis=0)
    blocks = (bsz + pad) // bb
    kernel = functools.partial(
        _attn_stream_kernel, heads=heads, t=t, d_head=d // heads,
        scale=scale, causal=causal, eps=eps, ck=ck, n_chunks=n_chunks,
    )
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),     # wqkv stays in HBM
            _full_spec(bqkv.shape),
            _full_spec(wout.shape),
            _full_spec(bout.shape),
            _full_spec(g.shape),
            _full_spec(b.shape),
        ],
        out_specs=pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz + pad, t, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb * t, d), x.dtype),          # LN(x)
            pltpu.VMEM((bb, t, d3), x.dtype),          # qkv
            pltpu.VMEM((2, d, ck), x.dtype),           # wqkv tiles
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, wqkv, bqkv, wout, bout, g, b)
    return out[:bsz]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _attn_stream_p(x, wqkv, bqkv, wout, bout, g, b,
                   heads, causal, eps, block_batches, interpret):
    return _attn_stream_fwd_impl(x, wqkv, bqkv, wout, bout, g, b,
                                 heads, causal, eps, block_batches,
                                 interpret)


def _attn_stream_fwd(x, wqkv, bqkv, wout, bout, g, b,
                     heads, causal, eps, block_batches, interpret):
    out = _attn_stream_fwd_impl(x, wqkv, bqkv, wout, bout, g, b,
                                heads, causal, eps, block_batches,
                                interpret)
    return out, (x, wqkv, bqkv, wout, bout, g, b)


_attn_stream_p.defvjp(_attn_stream_fwd, _attn_block_bwd)


def _mlp_stream_fwd_impl(x, wfc, bfc, wproj, bproj, g, b,
                         eps, block_batches, interpret):
    bsz, t, d = x.shape
    d4 = wfc.shape[1]
    itemsize = x.dtype.itemsize
    # Largest power-of-2 chunk whose [D, ck] tile stays ≤ 512 KB: the
    # four live tiles (2 slots × fc+proj) then hold ≤ 2 MB of VMEM,
    # leaving the budget to the activation block.
    ck = d4
    while ck > 1 and (d * ck * itemsize > (512 << 10) or d4 % ck):
        ck //= 2
    n_chunks = d4 // ck
    if block_batches is None:
        env = os.environ.get("CLIP_PPO_MLP_STREAM_BB")
        if env:
            block_batches = int(env)
        else:
            # x + pipelined in/out slots (~4·itemsize) + y + fp32 acc
            per_b = t * d * (5 * itemsize + 4)
            block_batches = max(1, min(8, (9 << 20) // per_b))
    bb = block_batches
    pad = (-bsz) % bb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, t, d), x.dtype)], axis=0)
    blocks = (bsz + pad) // bb
    kernel = functools.partial(_mlp_stream_kernel, t=t, eps=eps, ck=ck,
                               n_chunks=n_chunks)
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),     # wfc stays in HBM
            _full_spec(bfc.shape),
            pl.BlockSpec(memory_space=pltpu.ANY),     # wproj stays in HBM
            _full_spec(bproj.shape),
            _full_spec(g.shape),
            _full_spec(b.shape),
        ],
        out_specs=pl.BlockSpec((bb, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz + pad, t, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb * t, d), x.dtype),          # LN(x)
            pltpu.VMEM((bb * t, d), jnp.float32),      # accumulator
            pltpu.VMEM((2, d, ck), x.dtype),           # fc tiles
            pltpu.VMEM((2, ck, d), x.dtype),           # proj tiles
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, wfc, bfc, wproj, bproj, g, b)
    return out[:bsz]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _mlp_stream_p(x, wfc, bfc, wproj, bproj, g, b,
                  eps, block_batches, interpret):
    return _mlp_stream_fwd_impl(x, wfc, bfc, wproj, bproj, g, b,
                                eps, block_batches, interpret)


def _mlp_stream_fwd(x, wfc, bfc, wproj, bproj, g, b,
                    eps, block_batches, interpret):
    out = _mlp_stream_fwd_impl(x, wfc, bfc, wproj, bproj, g, b,
                               eps, block_batches, interpret)
    return out, (x, wfc, bfc, wproj, bproj, g, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _mlp_block_p(x, wfc, bfc, wproj, bproj, g, b,
                 eps, block_batches, interpret):
    return _mlp_block_fwd_impl(x, wfc, bfc, wproj, bproj, g, b,
                               eps, block_batches, interpret)


def _mlp_block_fwd_impl(x, wfc, bfc, wproj, bproj, g, b,
                        eps, block_batches, interpret):
    bsz, t, d = x.shape
    d4 = wfc.shape[1]
    # the [Bb·T, 4D] hidden + both weight mats live in VMEM: budget the
    # activation block to ~2 MB (ViT-B/32 → 4, text towers → 8).
    if block_batches is None:
        env = os.environ.get("CLIP_PPO_MLP_BLOCK_BATCHES")
        if env:
            block_batches = int(env)
        else:
            block_bytes = t * d4 * x.dtype.itemsize
            block_batches = max(1, min(8, (2 << 20) // block_bytes))
    kernel = functools.partial(_mlp_block_kernel, t=t, eps=eps)
    return _blocked_call(kernel, x, [wfc, bfc, wproj, bproj, g, b],
                         block_batches, interpret)


def _mlp_block_fwd(x, wfc, bfc, wproj, bproj, g, b,
                   eps, block_batches, interpret):
    out = _mlp_block_fwd_impl(x, wfc, bfc, wproj, bproj, g, b,
                              eps, block_batches, interpret)
    return out, (x, wfc, bfc, wproj, bproj, g, b)


def _mlp_block_bwd(eps, block_batches, interpret, res, ct):
    x, wfc, bfc, wproj, bproj, g, b = res
    _, vjp = jax.vjp(
        lambda *a: _mlp_block_ref(*a, eps=eps),
        x, wfc, bfc, wproj, bproj, g, b,
    )
    return vjp(ct)


_mlp_block_p.defvjp(_mlp_block_fwd, _mlp_block_bwd)
_mlp_chunked_p.defvjp(_mlp_chunked_fwd, _mlp_block_bwd)
_mlp_stream_p.defvjp(_mlp_stream_fwd, _mlp_block_bwd)


# ---------------------------------------------------------------------------
# Public entries (consume model.py param dicts)
# ---------------------------------------------------------------------------


def fused_attn_block(
    x: jax.Array,
    ln1: dict,
    attn: dict,
    heads: int,
    causal: bool = False,
    eps: float = 1e-5,
    block_batches: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``x + out_proj(attention(qkv_proj(LN(x))))`` in one Pallas pass.

    ``ln1``/``attn`` are model.py resblock sub-dicts (`ln_1`, `attn`).
    The qkv and attention intermediates never touch HBM. Differentiable
    via a custom VJP that recomputes through the XLA reference.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = x.dtype
    return _attn_block_p(
        x,
        attn["in_proj_w"].astype(dt).T,
        _row(attn["in_proj_b"], dt),
        attn["out_proj_w"].astype(dt).T,
        _row(attn["out_proj_b"], dt),
        _row(ln1["scale"], dt),
        _row(ln1["bias"], dt),
        heads, causal, eps, block_batches, interpret,
    )


def fused_attn_block_stream(
    x: jax.Array,
    ln1: dict,
    attn: dict,
    heads: int,
    causal: bool = False,
    eps: float = 1e-5,
    block_batches: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """:func:`fused_attn_block` with the qkv weights streamed from HBM —
    for ViT-L/14-class widths where resident weights starve the
    activation blocks (see _attn_stream_kernel)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = x.dtype
    return _attn_stream_p(
        x,
        attn["in_proj_w"].astype(dt).T,
        _row(attn["in_proj_b"], dt),
        attn["out_proj_w"].astype(dt).T,
        _row(attn["out_proj_b"], dt),
        _row(ln1["scale"], dt),
        _row(ln1["bias"], dt),
        heads, causal, eps, block_batches, interpret,
    )


def fused_mlp_block(
    x: jax.Array,
    ln2: dict,
    mlp: dict,
    eps: float = 1e-5,
    block_batches: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``x + proj(quick_gelu(fc(LN(x))))`` in one Pallas pass; the
    [B, T, 4D] hidden never touches HBM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = x.dtype
    d = x.shape[-1]
    d4 = mlp["fc_w"].shape[0]
    if 2 * d * d4 * jnp.dtype(dt).itemsize > (12 << 20):
        # ViT-L/14-class widths: both weight mats can't stay VMEM-resident
        # (1024×4096×2 ≈ 16.8 MB bf16 > VMEM). The XLA formulation is the
        # DEFAULT here: it tiles the matmuls with proper weight reuse,
        # while the d4-chunked grid variant at its forced block_batches=1
        # re-streams the full 33.6 MB of MLP weights per batch element —
        # HBM-bound by construction (and its first cut exceeded the 16 MB
        # scoped-VMEM stack on v5e). CLIP_PPO_MLP_CHUNKED=1 opts into the
        # chunked kernel for hardware A/Bs.
        if os.environ.get("CLIP_PPO_MLP_CHUNKED", "0") == "1":
            # r3's d4-chunked grid variant, kept for A/Bs
            # (benchmarks/mlp_stream_ab.py: 170.7 ms vs stream 168.5).
            return _mlp_chunked_p(
                x,
                mlp["fc_w"].astype(dt).T,
                _row(mlp["fc_b"], dt),
                mlp["proj_w"].astype(dt).T,
                _row(mlp["proj_b"], dt),
                _row(ln2["scale"], dt),
                _row(ln2["bias"], dt),
                eps, block_batches, interpret,
            )
        if os.environ.get("CLIP_PPO_MLP_STREAM", "1") != "1":
            return _mlp_block_ref(
                x, mlp["fc_w"].astype(dt).T, _row(mlp["fc_b"], dt),
                mlp["proj_w"].astype(dt).T, _row(mlp["proj_b"], dt),
                _row(ln2["scale"], dt), _row(ln2["bias"], dt), eps,
            )
        # Weight-streaming kernel — the r4 DEFAULT at over-budget widths:
        # manual double-buffered [D, ck]/[ck, D] weight-tile DMAs behind
        # the matmuls, the activation block freed of the weight VMEM
        # footprint. Measured 1.171x the XLA formulation on the isolated
        # batch-256 ViT-L/14 24-layer MLP stack (168.5 vs 197.4 ms,
        # v5e; block_batches auto=2 optimal — 1 reads 179.1 ms, 3-4
        # exceed VMEM; benchmarks/mlp_stream_ab.py).
        # CLIP_PPO_MLP_STREAM=0 restores the XLA fallback.
        return _mlp_stream_p(
            x,
            mlp["fc_w"].astype(dt).T,
            _row(mlp["fc_b"], dt),
            mlp["proj_w"].astype(dt).T,
            _row(mlp["proj_b"], dt),
            _row(ln2["scale"], dt),
            _row(ln2["bias"], dt),
            eps, block_batches, interpret,
        )
    return _mlp_block_p(
        x,
        mlp["fc_w"].astype(dt).T,
        _row(mlp["fc_b"], dt),
        mlp["proj_w"].astype(dt).T,
        _row(mlp["proj_b"], dt),
        _row(ln2["scale"], dt),
        _row(ln2["bias"], dt),
        eps, block_batches, interpret,
    )
