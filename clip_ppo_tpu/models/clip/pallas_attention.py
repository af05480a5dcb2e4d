"""Pallas TPU kernel: batch-packed attention for tiny sequences (opt-in).

CLIP's sequences are tiny (50 image tokens), so each per-(batch, head)
score matmul is ~[50, 64] @ [64, 50] — far below the 128×128 MXU tile.
This kernel packs ``group`` (batch, head) pairs into one block-diagonal
score computation

    S_pack = (Q₁‖…‖Q_G) @ (K₁‖…‖K_G)ᵀ                [G·T, G·T]

(G× the needed FLOPs — the cross-pair blocks are waste — at much higher
MXU fill; masking the cross blocks to -inf before the softmax makes the
second matmul automatically correct), processing ``block_pairs`` pairs
per grid step to amortize DMA.

Measured on v5e (ViT-B/32, batch 1024, `docs/PERFORMANCE.md`): the best
variant (block_pairs=64, group=4) reaches 142 ms/batch vs 150 ms for the
XLA einsum path — only ~5%, because XLA's batched dot already tiles the
small matrices well and the stage is partly softmax/layout-bound. The
kernel therefore stays **opt-in** (``attention_impl="pallas"``); "auto"
keeps the XLA path. Forward-only: every consumer sits behind
``stop_gradient`` (frozen CLIP towers) or outside the differentiated
loss, so no VJP is required. Off-TPU the interpreter runs the same code
for tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
