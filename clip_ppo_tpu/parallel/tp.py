"""Tensor-parallel sharding rules for the CLIP towers.

SURVEY §2c: the reference is single-device; the TPU build plans optional
Megatron-style tensor parallelism for the large-encoder sweeps
(ViT-L/14). GSPMD does the work: annotate the weight shardings below on
the ``tp`` mesh axis and jit — the compiler inserts the all-reduces after
each block's row-sharded contractions, riding ICI.

Per transformer block:
* ``attn.in_proj_w  [3·width, width]``  → P("tp", None)   (column-parallel)
* ``attn.out_proj_w [width, width]``    → P(None, "tp")   (row-parallel)
* ``mlp.fc_w        [4·width, width]``  → P("tp", None)
* ``mlp.proj_w      [width, 4·width]``  → P(None, "tp")
* biases of column-parallel layers shard on their output dim; LayerNorms,
  embeddings and projections replicate.

For full-rate attention keep ``heads % tp == 0`` (ViT-L/14 has 16 heads);
GSPMD remains *correct* for any split, just slower.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_specs() -> dict:
    return {
        "ln_1": {"scale": P(), "bias": P()},
        "ln_2": {"scale": P(), "bias": P()},
        "attn": {
            "in_proj_w": P("tp", None),
            "in_proj_b": P("tp"),
            "out_proj_w": P(None, "tp"),
            "out_proj_b": P(),
        },
        "mlp": {
            "fc_w": P("tp", None),
            "fc_b": P("tp"),
            "proj_w": P(None, "tp"),
            "proj_b": P(),
        },
    }


def clip_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a CLIP params pytree."""
    specs: dict = {}
    if "visual" in params:
        v = params["visual"]
        specs["visual"] = {
            "patch_embed_w": P(),
            "class_embedding": P(),
            "positional_embedding": P(),
            "ln_pre": {"scale": P(), "bias": P()},
            "transformer": {
                "resblocks": [
                    _block_specs() for _ in v["transformer"]["resblocks"]
                ]
            },
            "ln_post": {"scale": P(), "bias": P()},
            "proj": P(),
        }
    if "text" in params:
        t = params["text"]
        specs["text"] = {
            "token_embedding": P(),
            "positional_embedding": P(),
            "transformer": {
                "resblocks": [
                    _block_specs() for _ in t["transformer"]["resblocks"]
                ]
            },
            "ln_final": {"scale": P(), "bias": P()},
            "text_projection": P(),
        }
    if "logit_scale" in params:
        specs["logit_scale"] = P()
    return specs


def clip_param_shardings(mesh: Mesh, params: dict) -> dict:
    """NamedSharding pytree for a CLIP params pytree (PartitionSpec is
    itself a tuple-pytree, so convert with an is_leaf barrier first)."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        clip_param_specs(params),
        is_leaf=lambda s: isinstance(s, P),
    )


def shard_clip_params(mesh: Mesh, params: dict) -> dict:
    """Place CLIP params with tensor-parallel shardings on ``mesh``."""
    return jax.tree_util.tree_map(
        jax.device_put, params, clip_param_shardings(mesh, params)
    )
