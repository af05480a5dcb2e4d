"""OpenAI checkpoint loading paths: TorchScript archive + raw state dict.

No real pretrained weights exist in this image; these tests synthesize a
tiny torch module with OpenAI CLIP's exact parameter layout, save it both
as a TorchScript archive (what ``clip.load`` downloads) and a raw
``torch.save`` state dict, and verify ``load_openai_checkpoint`` restores
a numerically identical params pytree either way.
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip.loader import (
    find_checkpoint,
    load_clip_model,
    load_openai_checkpoint,
)

SMALL = CLIPConfig(
    embed_dim=16,
    image_size=32,
    patch_size=16,
    vision_width=32,
    vision_layers=1,
    vision_heads=1,
    context_length=8,
    vocab_size=64,
    text_width=32,
    text_heads=1,
    text_layers=1,
)


def _openai_module(cfg: CLIPConfig) -> torch.nn.Module:
    """Minimal scriptable module whose state_dict has OpenAI's layout."""
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, w):
            super().__init__()
            self.ln_1 = nn.LayerNorm(w)
            self.ln_2 = nn.LayerNorm(w)
            self.attn = nn.MultiheadAttention(w, 1)
            self.mlp = nn.Sequential()
            self.mlp.add_module("c_fc", nn.Linear(w, 4 * w))
            self.mlp.add_module("c_proj", nn.Linear(4 * w, w))

        def forward(self, x):
            return x

    class Tower(nn.Module):
        def __init__(self, layers, w):
            super().__init__()
            self.resblocks = nn.ModuleList([Block(w) for _ in range(layers)])

        def forward(self, x):
            return x

    class Visual(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, cfg.vision_width, cfg.patch_size,
                                   stride=cfg.patch_size, bias=False)
            self.class_embedding = nn.Parameter(torch.randn(cfg.vision_width))
            self.positional_embedding = nn.Parameter(
                torch.randn(cfg.num_patches + 1, cfg.vision_width)
            )
            self.ln_pre = nn.LayerNorm(cfg.vision_width)
            self.transformer = Tower(cfg.vision_layers, cfg.vision_width)
            self.ln_post = nn.LayerNorm(cfg.vision_width)
            self.proj = nn.Parameter(torch.randn(cfg.vision_width, cfg.embed_dim))

        def forward(self, x):
            return x

    class CLIP(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual = Visual()
            self.token_embedding = nn.Embedding(cfg.vocab_size, cfg.text_width)
            self.positional_embedding = nn.Parameter(
                torch.randn(cfg.context_length, cfg.text_width)
            )
            self.transformer = Tower(cfg.text_layers, cfg.text_width)
            self.ln_final = nn.LayerNorm(cfg.text_width)
            self.text_projection = nn.Parameter(
                torch.randn(cfg.text_width, cfg.embed_dim)
            )
            self.logit_scale = nn.Parameter(torch.tensor(2.6592))

        def forward(self, x):
            return x

    torch.manual_seed(0)
    return CLIP().eval()


def test_torchscript_archive_roundtrip(tmp_path):
    model = _openai_module(SMALL)
    path = tmp_path / "ViT-Tiny.pt"
    torch.jit.save(torch.jit.script(model), str(path))
    params, cfg = load_openai_checkpoint(str(path))
    assert cfg.vision_width == SMALL.vision_width
    assert cfg.embed_dim == SMALL.embed_dim
    sd = model.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["visual"]["positional_embedding"]),
        sd["visual.positional_embedding"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["text"]["token_embedding"]),
        sd["token_embedding.weight"].numpy(),
        rtol=1e-6,
    )
    assert float(params["logit_scale"]) == pytest.approx(2.6592, rel=1e-5)


def test_raw_state_dict_roundtrip(tmp_path):
    model = _openai_module(SMALL)
    path = tmp_path / "raw.pt"
    torch.save(model.state_dict(), str(path))
    params, cfg = load_openai_checkpoint(str(path))
    assert cfg.vision_layers == SMALL.vision_layers
    blk = params["visual"]["transformer"]["resblocks"][0]
    sd = model.state_dict()
    np.testing.assert_allclose(
        np.asarray(blk["attn"]["in_proj_w"]),
        sd["visual.transformer.resblocks.0.attn.in_proj_weight"].numpy(),
        rtol=1e-6,
    )


def test_checkpoint_dir_env(tmp_path, monkeypatch):
    model = _openai_module(SMALL)
    path = tmp_path / "ViT-B-32.pt"
    torch.jit.save(torch.jit.script(model), str(path))
    monkeypatch.setenv("CLIP_PPO_CHECKPOINT_DIR", str(tmp_path))
    assert find_checkpoint("ViT-B/32") == str(path)
    params, cfg = load_clip_model("ViT-B/32", pretrained=True)
    assert cfg.vision_width == SMALL.vision_width


def test_missing_checkpoint_raises(monkeypatch, tmp_path):
    monkeypatch.setenv("CLIP_PPO_CHECKPOINT_DIR", str(tmp_path))
    monkeypatch.setenv("HOME", str(tmp_path))  # empty ~/.cache
    with pytest.raises(FileNotFoundError):
        load_clip_model("ViT-B/32", pretrained=True)


def test_full_size_vitb32_roundtrip(tmp_path, monkeypatch):
    """Pretrained-readiness drill at full scale (VERDICT r1 item 5): a
    synthesized ViT-B/32 TorchScript archive with OpenAI's exact layout
    and fp16 dtype round-trips through the real loader path, yields the
    canonical config, and both towers run end-to-end on the converted
    weights."""
    import jax.numpy as jnp

    from clip_ppo_tpu.models.clip import model as clip_model_mod
    from clip_ppo_tpu.models.clip.config import CLIP_CONFIGS
    from clip_ppo_tpu.models.clip.synth_checkpoint import (
        write_fake_openai_checkpoint,
    )

    path = str(tmp_path / "ViT-B-32.pt")
    write_fake_openai_checkpoint(path, "ViT-B/32", seed=0)
    monkeypatch.setenv("CLIP_PPO_CHECKPOINT_DIR", str(tmp_path))

    params, cfg = load_clip_model("ViT-B/32", pretrained=True)
    ref = CLIP_CONFIGS["ViT-B/32"]
    assert cfg == ref, "detect_config must recover the canonical ViT-B/32"
    assert params["visual"]["patch_embed_w"].shape == (32 * 32 * 3, 768)
    assert len(params["visual"]["transformer"]["resblocks"]) == 12
    assert params["text"]["text_projection"].shape == (512, 512)

    # numeric parity with the archive contents (fp16 → fp32)
    m = torch.jit.load(path, map_location="cpu")
    sd = m.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["visual"]["class_embedding"]),
        sd["visual.class_embedding"].float().numpy(),
        rtol=1e-6,
    )

    # both towers run at full shapes on the loaded weights
    img = jnp.zeros((2, 224, 224, 3), jnp.float32)
    feats = clip_model_mod.encode_image(params, cfg, img)
    assert feats.shape == (2, 512) and bool(jnp.isfinite(feats).all())
    toks = jnp.zeros((2, 77), jnp.int32).at[:, 0].set(1)
    tfeats = clip_model_mod.encode_text(params, cfg, toks)
    assert tfeats.shape == (2, 512) and bool(jnp.isfinite(tfeats).all())


def test_full_size_vitl14_roundtrip(tmp_path, monkeypatch):
    """Same pretrained-readiness drill at the ViT-L/14 geometry: patch 14
    (grid 16), width 1024 × 24 layers, text width 768 — detect_config
    must recover the canonical config purely from the archive shapes and
    both towers must run on the converted weights."""
    import jax.numpy as jnp

    from clip_ppo_tpu.models.clip import model as clip_model_mod
    from clip_ppo_tpu.models.clip.config import CLIP_CONFIGS
    from clip_ppo_tpu.models.clip.synth_checkpoint import (
        write_fake_openai_checkpoint,
    )

    path = str(tmp_path / "ViT-L-14.pt")
    write_fake_openai_checkpoint(path, "ViT-L/14", seed=0)
    monkeypatch.setenv("CLIP_PPO_CHECKPOINT_DIR", str(tmp_path))

    params, cfg = load_clip_model("ViT-L/14", pretrained=True)
    assert cfg == CLIP_CONFIGS["ViT-L/14"], "detect_config must recover ViT-L/14"
    assert params["visual"]["patch_embed_w"].shape == (14 * 14 * 3, 1024)
    assert len(params["visual"]["transformer"]["resblocks"]) == 24
    assert params["text"]["text_projection"].shape == (768, 768)

    img = jnp.zeros((1, 224, 224, 3), jnp.float32)
    feats = clip_model_mod.encode_image(params, cfg, img)
    assert feats.shape == (1, 768) and bool(jnp.isfinite(feats).all())
    toks = jnp.zeros((1, 77), jnp.int32).at[:, 0].set(1)
    tfeats = clip_model_mod.encode_text(params, cfg, toks)
    assert tfeats.shape == (1, 768) and bool(jnp.isfinite(tfeats).all())
