"""CLIP checkpoint loading: OpenAI ``.pt`` / HF ``CLIPModel`` → params pytree.

The reference obtains pretrained weights through ``clip.load(name)``
(`shared/clip_ppo_utils.py:79-97` downloads OpenAI's TorchScript archive).
Here loading is split from compute: these converters produce the pure-JAX
params pytree consumed by :mod:`clip_ppo_tpu.models.clip.model`, from

* OpenAI's released ``ViT-*.pt`` TorchScript archives (``torch.jit.load``),
* a raw OpenAI-layout ``state_dict`` saved with ``torch.save``,
* a HuggingFace ``transformers.CLIPModel`` (or its ``state_dict``), which is
  also how the parity tests cross-check the architecture offline.

Checkpoints are searched in ``$CLIP_PPO_CHECKPOINT_DIR`` then
``~/.cache/clip`` (OpenAI's cache location). In this zero-egress
environment none may exist; ``load_clip_model(..., pretrained="auto")``
then falls back to deterministic random initialization so the full
CLIP-PPO pipeline (frozen encoder, text/image alignment) still runs — that
fallback is exactly the reference's RANDOM_ENCODER ablation
(`clip_ppo_utils.py:13-18`) applied to both towers.
"""

from __future__ import annotations

import os
import warnings
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.models.clip.config import CLIP_CONFIGS, CLIPConfig

_CKPT_FILENAMES = {
    "ViT-B/32": "ViT-B-32.pt",
    "ViT-B/16": "ViT-B-16.pt",
    "ViT-L/14": "ViT-L-14.pt",
}


def _np(t: Any) -> np.ndarray:
    """torch tensor (possibly fp16) → float32 numpy."""
    return np.asarray(t.detach().cpu().float().numpy(), dtype=np.float32)


def detect_config(sd: dict) -> CLIPConfig:
    """Infer the architecture from an OpenAI-layout state dict."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    patch_size = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    vision_layers = (
        max(
            int(k.split(".")[3])
            for k in sd
            if k.startswith("visual.transformer.resblocks.")
        )
        + 1
    )
    text_width = sd["ln_final.weight"].shape[0]
    text_layers = (
        max(int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks."))
        + 1
    )
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_size=grid * patch_size,
        patch_size=patch_size,
        vision_width=vision_width,
        vision_layers=vision_layers,
        vision_heads=vision_width // 64,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=text_layers,
    )


def _block_from_openai(sd: dict, prefix: str) -> dict:
    g = lambda k: jnp.asarray(_np(sd[prefix + k]))
    return {
        "ln_1": {"scale": g("ln_1.weight"), "bias": g("ln_1.bias")},
        "ln_2": {"scale": g("ln_2.weight"), "bias": g("ln_2.bias")},
        "attn": {
            "in_proj_w": g("attn.in_proj_weight"),
            "in_proj_b": g("attn.in_proj_bias"),
            "out_proj_w": g("attn.out_proj.weight"),
            "out_proj_b": g("attn.out_proj.bias"),
        },
        "mlp": {
            "fc_w": g("mlp.c_fc.weight"),
            "fc_b": g("mlp.c_fc.bias"),
            "proj_w": g("mlp.c_proj.weight"),
            "proj_b": g("mlp.c_proj.bias"),
        },
    }


def convert_openai_state_dict(sd: dict) -> tuple[dict, CLIPConfig]:
    """OpenAI CLIP state dict → (params pytree, CLIPConfig).

    The patch-embed conv ``[width, 3, ps, ps]`` becomes the
    ``[ps·ps·3, width]`` matmul weight with (py, px, c) row layout —
    matching the reshape in ``encode_image`` (a stride=ps VALID conv over
    NHWC is exactly this matmul).
    """
    cfg = detect_config(sd)
    conv_w = _np(sd["visual.conv1.weight"])  # [width, 3, ps, ps]
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(
        cfg.patch_size * cfg.patch_size * 3, cfg.vision_width
    )
    visual = {
        "patch_embed_w": jnp.asarray(patch_w),
        "class_embedding": jnp.asarray(_np(sd["visual.class_embedding"])),
        "positional_embedding": jnp.asarray(_np(sd["visual.positional_embedding"])),
        "ln_pre": {
            "scale": jnp.asarray(_np(sd["visual.ln_pre.weight"])),
            "bias": jnp.asarray(_np(sd["visual.ln_pre.bias"])),
        },
        "transformer": {
            "resblocks": [
                _block_from_openai(sd, f"visual.transformer.resblocks.{i}.")
                for i in range(cfg.vision_layers)
            ]
        },
        "ln_post": {
            "scale": jnp.asarray(_np(sd["visual.ln_post.weight"])),
            "bias": jnp.asarray(_np(sd["visual.ln_post.bias"])),
        },
        "proj": jnp.asarray(_np(sd["visual.proj"])),
    }
    text = {
        "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
        "positional_embedding": jnp.asarray(_np(sd["positional_embedding"])),
        "transformer": {
            "resblocks": [
                _block_from_openai(sd, f"transformer.resblocks.{i}.")
                for i in range(cfg.text_layers)
            ]
        },
        "ln_final": {
            "scale": jnp.asarray(_np(sd["ln_final.weight"])),
            "bias": jnp.asarray(_np(sd["ln_final.bias"])),
        },
        "text_projection": jnp.asarray(_np(sd["text_projection"])),
    }
    params = {"visual": visual, "text": text}
    if "logit_scale" in sd:
        params["logit_scale"] = jnp.asarray(_np(sd["logit_scale"]))
    return params, cfg


def _block_from_hf(sd: dict, prefix: str) -> dict:
    g = lambda k: _np(sd[prefix + k])
    in_proj_w = np.concatenate(
        [g("self_attn.q_proj.weight"), g("self_attn.k_proj.weight"),
         g("self_attn.v_proj.weight")], axis=0,
    )
    in_proj_b = np.concatenate(
        [g("self_attn.q_proj.bias"), g("self_attn.k_proj.bias"),
         g("self_attn.v_proj.bias")], axis=0,
    )
    return {
        "ln_1": {"scale": jnp.asarray(g("layer_norm1.weight")),
                 "bias": jnp.asarray(g("layer_norm1.bias"))},
        "ln_2": {"scale": jnp.asarray(g("layer_norm2.weight")),
                 "bias": jnp.asarray(g("layer_norm2.bias"))},
        "attn": {
            "in_proj_w": jnp.asarray(in_proj_w),
            "in_proj_b": jnp.asarray(in_proj_b),
            "out_proj_w": jnp.asarray(g("self_attn.out_proj.weight")),
            "out_proj_b": jnp.asarray(g("self_attn.out_proj.bias")),
        },
        "mlp": {
            "fc_w": jnp.asarray(g("mlp.fc1.weight")),
            "fc_b": jnp.asarray(g("mlp.fc1.bias")),
            "proj_w": jnp.asarray(g("mlp.fc2.weight")),
            "proj_b": jnp.asarray(g("mlp.fc2.bias")),
        },
    }


def convert_hf_state_dict(sd: dict, cfg: CLIPConfig) -> dict:
    """HuggingFace ``CLIPModel.state_dict()`` → params pytree.

    HF splits q/k/v and stores the projections as ``Linear`` weights
    ([out, in], applied as x @ W.T) — the same convention the model code
    uses, so apart from qkv concatenation the mapping is mechanical.
    """
    conv_w = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    patch_w = conv_w.transpose(2, 3, 1, 0).reshape(
        cfg.patch_size * cfg.patch_size * 3, cfg.vision_width
    )
    visual = {
        "patch_embed_w": jnp.asarray(patch_w),
        "class_embedding": jnp.asarray(
            _np(sd["vision_model.embeddings.class_embedding"])
        ),
        "positional_embedding": jnp.asarray(
            _np(sd["vision_model.embeddings.position_embedding.weight"])
        ),
        "ln_pre": {
            "scale": jnp.asarray(_np(sd["vision_model.pre_layrnorm.weight"])),
            "bias": jnp.asarray(_np(sd["vision_model.pre_layrnorm.bias"])),
        },
        "transformer": {
            "resblocks": [
                _block_from_hf(sd, f"vision_model.encoder.layers.{i}.")
                for i in range(cfg.vision_layers)
            ]
        },
        "ln_post": {
            "scale": jnp.asarray(_np(sd["vision_model.post_layernorm.weight"])),
            "bias": jnp.asarray(_np(sd["vision_model.post_layernorm.bias"])),
        },
        "proj": jnp.asarray(_np(sd["visual_projection.weight"]).T),
    }
    text = {
        "token_embedding": jnp.asarray(
            _np(sd["text_model.embeddings.token_embedding.weight"])
        ),
        "positional_embedding": jnp.asarray(
            _np(sd["text_model.embeddings.position_embedding.weight"])
        ),
        "transformer": {
            "resblocks": [
                _block_from_hf(sd, f"text_model.encoder.layers.{i}.")
                for i in range(cfg.text_layers)
            ]
        },
        "ln_final": {
            "scale": jnp.asarray(_np(sd["text_model.final_layer_norm.weight"])),
            "bias": jnp.asarray(_np(sd["text_model.final_layer_norm.bias"])),
        },
        "text_projection": jnp.asarray(_np(sd["text_projection.weight"]).T),
    }
    params = {"visual": visual, "text": text}
    if "logit_scale" in sd:
        params["logit_scale"] = jnp.asarray(_np(sd["logit_scale"]))
    return params


def find_checkpoint(name: str) -> str | None:
    fname = _CKPT_FILENAMES.get(name, name.replace("/", "-") + ".pt")
    for root in (
        os.environ.get("CLIP_PPO_CHECKPOINT_DIR", ""),
        os.path.expanduser("~/.cache/clip"),
        os.path.expanduser("~/.cache/clip_ppo_tpu"),
    ):
        if not root:
            continue
        p = os.path.join(root, fname)
        if os.path.exists(p):
            return p
    return None


def load_openai_checkpoint(path: str) -> tuple[dict, CLIPConfig]:
    """Load an OpenAI ``.pt`` (TorchScript archive or raw state dict)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return convert_openai_state_dict(sd)


def load_clip_model(
    name: str = "ViT-B/32",
    path: str | None = None,
    pretrained: str | bool = "auto",
    seed: int = 0,
) -> tuple[dict, CLIPConfig]:
    """Frozen CLIP loader mirroring the reference ``load_clip_model``
    (`clip_ppo_utils.py:79-97`): returns (params, cfg); params are a plain
    pytree, "frozen" simply by never passing them to the optimizer.

    ``pretrained``: True requires a checkpoint (raises if absent); "auto"
    uses one when found, else warns and random-initializes; False always
    random-initializes (deterministic in ``seed``).
    """
    from clip_ppo_tpu.models.clip.model import init_clip_params

    cfg = CLIP_CONFIGS[name]
    ckpt = path or (find_checkpoint(name) if pretrained else None)
    if ckpt is not None:
        params, loaded_cfg = load_openai_checkpoint(ckpt)
        return params, loaded_cfg
    if pretrained is True:
        raise FileNotFoundError(
            f"no CLIP checkpoint for {name!r}; set $CLIP_PPO_CHECKPOINT_DIR "
            "or place the OpenAI .pt under ~/.cache/clip"
        )
    if pretrained == "auto":
        warnings.warn(
            f"no pretrained CLIP checkpoint found for {name!r}; using "
            "deterministic random initialization (RANDOM_ENCODER semantics)"
        )
    return init_clip_params(jax.random.PRNGKey(seed), cfg), cfg
