"""Pallas TPU attention kernels for CLIP's tiny sequences.

Two kernels, one lesson. Profiling the batch-1024 ViT-B/32 encode on v5e
showed the attention stage is NOT MXU-bound: the scores/softmax/AV math
costs ~2 ms/layer in isolation, but the XLA path spends ~4.5 ms/layer
relaying q/k/v from the fused [B, S, 3·768] qkv projection into padded
[B, S, H, 64] HBM buffers (64 < 128 lanes → 2× physical memory + strided
copies) and transposing the output back.

:func:`fused_qkv_attention` — the TPU default ("auto") for unmasked
vision attention — therefore consumes the qkv buffer in its NATURAL
layout, head-splits inside VMEM, keeps logits/softmax in VMEM, and emits
[B, S, D] ready for the output projection. Measured: attention stack
102 → 52 ms, full encode 150 → 92 ms (1.63×).

:func:`packed_attention` (opt-in, ``attention_impl="pallas"``) is the
earlier (batch, head)-pair block-diagonal packing experiment; it kept
the host-side [B,S,H,D] relayout and so only reached ~5% — retained as a
reference point and for its packing machinery.

``fused_qkv_attention`` is differentiable via a custom VJP that
recomputes the backward pass through the einsum formulation (the hot
consumers are frozen towers, so backward is the rare path);
``packed_attention`` stays forward-only. Off-TPU the interpreter runs
the same kernel code for tests. See pallas_block.py for the r3
block-fusion kernels that subsume this one when ``attention_impl=
"block"``.
"""

from __future__ import annotations

import functools
from typing import Optional

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Aligned head-pair (Dh=64) kernel variant: "rows" (default, r3) stacks the
# two masked q halves along the row axis for 2 batched MXU ops per pair;
# "unrolled" is the r2 per-(batch, pair) loop, kept for A/B measurement.
_PAIR_VARIANT = os.environ.get("CLIP_PPO_ATTN_PAIR_VARIANT", "rows")


def pair_masks(t: int, d_head: int, causal: bool):
    """Lane masks selecting each head's half of a 128-lane pair block,
    plus the row-stacked causal mask (rows 0..T-1 = lo head, T..2T-1 =
    hi head). Shared by the fused-qkv "rows" variant here and the
    block-fusion resblock kernel (pallas_block._pair_attention)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * d_head), 1)
    mlo = lane < d_head
    mhi = lane >= d_head
    causal_ok = None
    if causal:
        rr = jax.lax.broadcasted_iota(jnp.int32, (2 * t, t), 0) % t
        cc = jax.lax.broadcasted_iota(jnp.int32, (2 * t, t), 1)
        causal_ok = rr >= cc
    return mlo, mhi, causal_ok


def rows_pair_attention(q2, k2, v2, t, scale, mlo, mhi, causal_ok):
    """One head pair via the row-stacked identity: with q's lanes masked
    to one head's half, q_half · k2ᵀ == q_half · k_halfᵀ exactly (the
    other half's contributions multiply zeroed lanes), so k and v are
    used unmasked. The two masked q variants stack along the ROW axis →
    one [B, 2T, 128] × [B, T, 128]ᵀ batched score matmul and one
    [B, 2T, T] × [B, T, 128] AV matmul per pair; a lane-select merges
    the halves. Same FLOPs as four per-head dots, ~16× fewer
    instructions, fuller sublane occupancy."""
    dims = (((2,), (2,)), ((0,), (0,)))
    av_dims = (((2,), (1,)), ((0,), (0,)))
    qs = jnp.concatenate(
        [jnp.where(mlo, q2, 0), jnp.where(mhi, q2, 0)], axis=1
    )                                                     # [B, 2T, 128]
    s = jax.lax.dot_general(
        qs * scale, k2, dims, preferred_element_type=jnp.float32
    )                                                     # [B, 2T, T]
    if causal_ok is not None:
        s = jnp.where(causal_ok, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(v2.dtype)
    o2 = jax.lax.dot_general(
        p, v2, av_dims, preferred_element_type=jnp.float32
    )                                                     # [B, 2T, 128]
    return jnp.where(mlo, o2[:, :t, :], o2[:, t:, :])


def _fused_qkv_kernel(qkv_ref, o_ref, *, heads: int, t: int, d_head: int,
                      group: int, scale: float, causal: bool = False):
    """Per grid step: one block of batches, all heads, entirely in VMEM.

    ``qkv_ref``: [B_blk, T, 3·H·Dh] (the fused qkv projection output in
    its natural packed layout — no HBM head-split relayout ever happens);
    ``o_ref``: [B_blk, T, H·Dh]. Heads are sliced out of the lane
    dimension inside VMEM, where the relayout is register shuffling
    instead of an HBM round trip. ``group`` heads are packed per score
    matmul (block-diagonal mask) to halve MXU passes on the tiny [T, T]
    tiles.
    """
    b_blk = qkv_ref.shape[0]
    d = heads * d_head
    gt = group * t

    if (d_head * 2 == 128 and heads % 2 == 0 and group == 1
            and _PAIR_VARIANT == "packed"):
        # Fully-packed pair path (r3 experiment): like "rows" below but
        # ALL head pairs ride one batched score + one batched AV matmul
        # per block. One VMEM relayout gathers the pairs' 128-lane slices
        # onto a batch axis ([B, T, P·128] → [B·P, T, 128]); the masked
        # row-stacking and the no-waste k/v contraction are identical to
        # "rows".
        p_cnt = heads // 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
        mlo = lane < d_head
        # Masks are applied in the NATURAL [B, T, D] layout (a 2D mask
        # broadcasting into the relayouted pair view hits Mosaic's
        # unimplemented sublane broadcast).
        lane_d = jax.lax.broadcasted_iota(jnp.int32, (t, d), 1)
        mlo_d = (lane_d % 128) < d_head
        if causal:
            rr = jax.lax.broadcasted_iota(jnp.int32, (2 * t, t), 0) % t
            cc = jax.lax.broadcasted_iota(jnp.int32, (2 * t, t), 1)
            causal_ok = rr >= cc

        def to_pairs(x):  # [B, T, P·128] → [B·P, T, 128]
            return (
                x.reshape(b_blk, t, p_cnt, 128)
                .swapaxes(1, 2)
                .reshape(b_blk * p_cnt, t, 128)
            )

        q_full = qkv_ref[:, :, :d]
        k_all = to_pairs(qkv_ref[:, :, d:2 * d])
        v_all = to_pairs(qkv_ref[:, :, 2 * d:])
        qs = jnp.concatenate(
            [
                to_pairs(jnp.where(mlo_d, q_full, 0)),
                to_pairs(jnp.where(mlo_d, 0, q_full)),
            ],
            axis=1,
        )                                                     # [B·P, 2T, 128]
        s = jax.lax.dot_general(
            qs * scale, k_all, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                     # [B·P, 2T, T]
        if causal:
            s = jnp.where(causal_ok, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(v_all.dtype)
        o2 = jax.lax.dot_general(
            p, v_all, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                     # [B·P, 2T, 128]
        o = jnp.where(mlo, o2[:, :t, :], o2[:, t:, :])        # [B·P, T, 128]
        o = (
            o.reshape(b_blk, p_cnt, t, 128)
            .swapaxes(1, 2)
            .reshape(b_blk, t, d)
        )
        o_ref[:, :, :] = o.astype(o_ref.dtype)
        return

    if (d_head * 2 == 128 and heads % 2 == 0 and group == 1
            and _PAIR_VARIANT == "rows"):
        # Row-stacked head-pair path (r3): same disjoint-lane-mask
        # observation as the unrolled pair path below, but exploited
        # without ANY wasted MACs or per-(batch, pair) Python unrolling.
        # Key identity: with q's lanes masked to one head's half,
        # q_half · k2ᵀ = q_half · k_half ᵀ exactly (the other half's
        # contributions multiply the zeroed lanes), so k and v never need
        # masking or duplication. Stack the two masked q variants along
        # the ROW axis → one [B_blk, 2T, 128] × [B_blk, T, 128]ᵀ batched
        # score matmul per pair (rows 0..T-1 = lo head's [T, T] scores,
        # rows T..2T-1 = hi head's), softmax over the true T-length rows,
        # one batched [B_blk, 2T, T] × [B_blk, T, 128] AV matmul, then a
        # lane-select merges the halves. Per block this is 2 batched MXU
        # ops per pair (12 for ViT-B/32) instead of 4 dots × B_blk × 6
        # pairs = 192 small ones — same FLOPs, ~16× fewer instructions,
        # fuller sublane occupancy (2T=100 rows vs 50). Core math in
        # rows_pair_attention (shared with pallas_block).
        mlo, mhi, causal_ok = pair_masks(t, d_head, causal)
        for hp in range(heads // 2):
            sl = slice(hp * 128, (hp + 1) * 128)
            q2 = qkv_ref[:, :, sl]                            # [B, T, 128]
            k2 = qkv_ref[:, :, d + hp * 128: d + (hp + 1) * 128]
            v2 = qkv_ref[:, :, 2 * d + hp * 128: 2 * d + (hp + 1) * 128]
            o = rows_pair_attention(q2, k2, v2, t, scale, mlo, mhi,
                                    causal_ok)
            o_ref[:, :, sl] = o.astype(o_ref.dtype)
        return

    if d_head * 2 == 128 and heads % 2 == 0 and group == 1:
        # Aligned head-pair path (ViT-B/32, ViT-L/14, the text towers:
        # Dh=64): slice TWO heads as one 128-lane-aligned [T, 128] block
        # — no lane-shift shuffles — and make each head's contraction
        # correct by zero-masking the other half (zeros contribute
        # nothing to the dot). ~19% over the generic per-head loop.
        lane = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * d_head), 1)
        mlo = lane < d_head
        mhi = lane >= d_head
        if causal:
            rr = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
            causal_ok = rr >= cc
        for b in range(b_blk):
            qkv = qkv_ref[b]
            for hp in range(heads // 2):
                sl = slice(hp * 128, (hp + 1) * 128)
                q2 = qkv[:, sl]
                k2 = qkv[:, d + hp * 128: d + (hp + 1) * 128]
                v2 = qkv[:, 2 * d + hp * 128: 2 * d + (hp + 1) * 128]
                qlo = jnp.where(mlo, q2, 0)
                qhi = jnp.where(mhi, q2, 0)
                klo = jnp.where(mlo, k2, 0)
                khi = jnp.where(mhi, k2, 0)
                dims = (((1,), (1,)), ((), ()))
                slo = jax.lax.dot_general(
                    qlo * scale, klo, dims, preferred_element_type=jnp.float32
                )
                shi = jax.lax.dot_general(
                    qhi * scale, khi, dims, preferred_element_type=jnp.float32
                )
                if causal:
                    slo = jnp.where(causal_ok, slo, -jnp.inf)
                    shi = jnp.where(causal_ok, shi, -jnp.inf)
                plo = jax.nn.softmax(slo, axis=-1).astype(v2.dtype)
                phi = jax.nn.softmax(shi, axis=-1).astype(v2.dtype)
                olo = jnp.dot(plo, v2, preferred_element_type=jnp.float32)
                ohi = jnp.dot(phi, v2, preferred_element_type=jnp.float32)
                o = jnp.where(mlo, olo, ohi)
                o_ref[b, :, hp * 128:(hp + 1) * 128] = o.astype(o_ref.dtype)
        return

    for b in range(b_blk):
        qkv = qkv_ref[b]  # [T, 3·H·Dh]
        for g0 in range(0, heads, group):
            # pack `group` heads' q/k/v as [G·T, Dh]
            q = jnp.concatenate(
                [qkv[:, (g0 + j) * d_head:(g0 + j + 1) * d_head]
                 for j in range(group)], axis=0)
            k = jnp.concatenate(
                [qkv[:, d + (g0 + j) * d_head:d + (g0 + j + 1) * d_head]
                 for j in range(group)], axis=0)
            v = jnp.concatenate(
                [qkv[:, 2 * d + (g0 + j) * d_head:2 * d + (g0 + j + 1) * d_head]
                 for j in range(group)], axis=0)
            s = jax.lax.dot_general(
                q * scale, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G·T, G·T]
            if group > 1:
                row = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 0) // t
                col = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 1) // t
                s = jnp.where(row == col, s, -jnp.inf)
            if causal:
                rr = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 0) % t
                cc = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 1) % t
                s = jnp.where(rr >= cc, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)  # [G·T, Dh]
            for j in range(group):
                o_ref[b, :, (g0 + j) * d_head:(g0 + j + 1) * d_head] = (
                    o[j * t:(j + 1) * t].astype(o_ref.dtype)
                )


def _einsum_attention_from_qkv(
    qkv: jax.Array, heads: int, causal: bool = False
) -> jax.Array:
    """Differentiable reference of the fused kernel's math (same fp32
    softmax); used as the custom-VJP backward so the kernel is safe under
    reverse-mode AD (backward recomputes via XLA — rare path; all hot
    consumers are no-grad)."""
    b, t, d3 = qkv.shape
    d = d3 // 3
    dh = d // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, heads, dh)
    k = k.reshape(b, t, heads, dh)
    v = v.reshape(b, t, heads, dh)
    logits = jnp.einsum("bqhc,bkhc->bhqk", q / np.sqrt(dh), k)
    if causal:
        logits = logits + jnp.triu(jnp.full((t, t), -jnp.inf), k=1)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhc->bqhc", w, v).reshape(b, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _fused_qkv_attention_p(qkv, heads, block_batches, group, interpret, causal):
    return _fused_qkv_call(qkv, heads, block_batches, group, interpret, causal)


def _fused_fwd(qkv, heads, block_batches, group, interpret, causal):
    return (
        _fused_qkv_call(qkv, heads, block_batches, group, interpret, causal),
        qkv,
    )


def _fused_bwd(heads, block_batches, group, interpret, causal, qkv, ct):
    _, vjp = jax.vjp(
        lambda z: _einsum_attention_from_qkv(z, heads, causal), qkv
    )
    return vjp(ct)


_fused_qkv_attention_p.defvjp(_fused_fwd, _fused_bwd)


def fused_qkv_attention(
    qkv: jax.Array,
    heads: int,
    block_batches: Optional[int] = None,
    group: int = 1,
    interpret: Optional[bool] = None,
    causal: bool = False,
) -> jax.Array:
    """Public entry (see :func:`_fused_qkv_call` for the kernel docs):
    forward runs the Pallas kernel (``causal=True`` applies the text
    tower's causal mask in-kernel); reverse-mode AD is supported via a
    custom VJP that recomputes through the einsum reference."""
    return _fused_qkv_attention_p(
        qkv, heads, block_batches, group, interpret, causal
    )


@functools.partial(
    jax.jit,
    static_argnames=("heads", "block_batches", "group", "interpret", "causal"),
)
def _fused_qkv_call(
    qkv: jax.Array,
    heads: int,
    block_batches: Optional[int] = None,
    group: int = 1,
    interpret: Optional[bool] = None,
    causal: bool = False,
) -> jax.Array:
    """Attention straight from the fused qkv projection.

    ``qkv``: [B, T, 3·D] (layout of ``x @ in_proj_w.T``), returns
    [B, T, D] ready for the output projection. The XLA einsum path pays
    ~4.5 ms/layer (ViT-B/32, batch 1024, v5e) relaying q/k/v into padded
    [B, S, H, 64] buffers in HBM and transposing the output back; this
    kernel's inputs and outputs stay in the natural packed layout, so
    that tax disappears and the softmax never leaves VMEM. ``causal``
    applies the text tower's causal mask in-kernel (iota compare in
    VMEM). Reverse-mode AD goes through the public wrapper's custom VJP.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, d3 = qkv.shape
    d = d3 // 3
    d_head = d // heads
    assert heads % group == 0, (heads, group)
    scale = 1.0 / np.sqrt(d_head)

    if block_batches is None:
        # fit the double-buffered qkv block in a few MB of VMEM (~16 MB
        # total): ViT-B/32 (50×2304) → 8, ViT-L/14 (257×3072) → 2.
        block_bytes = t * d3 * qkv.dtype.itemsize
        block_batches = max(1, min(8, (4 << 20) // block_bytes))

    pad = (-b) % block_batches
    if pad:
        qkv = jnp.concatenate(
            [qkv, jnp.zeros((pad, t, d3), qkv.dtype)], axis=0
        )
    blocks = (b + pad) // block_batches

    kernel = functools.partial(
        _fused_qkv_kernel, heads=heads, t=t, d_head=d_head, group=group,
        scale=scale, causal=causal,
    )
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[pl.BlockSpec((block_batches, t, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_batches, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad, t, d), qkv.dtype),
        interpret=interpret,
    )(qkv)
    return out[:b]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, block_pairs: int, group: int,
                 t: int, scale: float):
    d = q_ref.shape[-1]
    gt = group * t
    for c in range(block_pairs // group):
        sl = slice(c * group, (c + 1) * group)
        q = q_ref[sl].reshape(gt, d)
        k = k_ref[sl].reshape(gt, d)
        v = v_ref[sl].reshape(gt, d)
        s = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [g·t, g·t]
        row_pair = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 0) // t
        col_pair = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 1) // t
        s = jnp.where(row_pair == col_pair, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[sl] = o.reshape(group, t, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "block_pairs", "interpret"))
def packed_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    group: int = 4,
    block_pairs: int = 64,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Softmax attention over ``[B, T, H, D]`` q/k/v (no mask support —
    CLIP's vision tower; the causal text tower keeps the XLA path).
    Returns ``[B, T, H, D]`` in q's dtype."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, h, d = q.shape
    assert block_pairs % group == 0
    scale = 1.0 / np.sqrt(d)

    # [B, T, H, D] → [B·H, T, D]; pad the pair axis to a block multiple.
    def to_pairs(x):
        return jnp.moveaxis(x, 2, 1).reshape(b * h, t, d)

    qp, kp, vp = to_pairs(q), to_pairs(k), to_pairs(v)
    n = b * h
    pad = (-n) % block_pairs
    if pad:
        z = jnp.zeros((pad, t, d), qp.dtype)
        qp = jnp.concatenate([qp, z], 0)
        kp = jnp.concatenate([kp, z], 0)
        vp = jnp.concatenate([vp, z], 0)
    blocks = (n + pad) // block_pairs

    kernel = functools.partial(
        _attn_kernel, block_pairs=block_pairs, group=group, t=t, scale=scale
    )
    spec = pl.BlockSpec(
        (block_pairs, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:n].reshape(b, h, t, d)
    return jnp.moveaxis(out, 1, 2)
