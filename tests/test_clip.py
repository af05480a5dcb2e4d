"""CLIP tower parity vs transformers' CLIPModel + tokenizer correctness.

No pretrained checkpoints exist in this environment (zero egress), so
architecture parity is established the strong offline way (SURVEY §4
implication b): instantiate HuggingFace's torch ``CLIPModel`` with QuickGELU
at a small config, convert its *random* weights through the real loader
path (``convert_hf_state_dict``), and require the JAX towers to reproduce
its float32 activations. Any error in attention/LN/MLP/pooling/projection
or in weight-layout conversion fails these tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.models.clip import (
    CLIPConfig,
    convert_hf_state_dict,
    convert_openai_state_dict,
    encode_image,
    encode_text,
    init_clip_params,
)
from clip_ppo_tpu.models.clip.tokenizer import (
    BPETokenizer,
    HashTokenizer,
    bytes_to_unicode,
)

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


SMALL = CLIPConfig(
    embed_dim=32,
    image_size=56,
    patch_size=28,
    vision_width=64,
    vision_layers=2,
    vision_heads=2,
    context_length=16,
    vocab_size=512,
    text_width=48,
    text_heads=2,
    text_layers=2,
)


@pytest.fixture(scope="module")
def hf_pair():
    """(hf_model, jax_params) sharing identical random weights."""
    hf_cfg = transformers.CLIPConfig(
        projection_dim=SMALL.embed_dim,
        text_config={
            "hidden_size": SMALL.text_width,
            "intermediate_size": 4 * SMALL.text_width,
            "num_hidden_layers": SMALL.text_layers,
            "num_attention_heads": SMALL.text_heads,
            "max_position_embeddings": SMALL.context_length,
            "vocab_size": SMALL.vocab_size,
            "hidden_act": "quick_gelu",
            # Pool at the first occurrence of the highest id, like OpenAI
            # (see test_text_parity for how inputs guarantee equivalence).
            "eos_token_id": SMALL.vocab_size - 1,
        },
        vision_config={
            "hidden_size": SMALL.vision_width,
            "intermediate_size": 4 * SMALL.vision_width,
            "num_hidden_layers": SMALL.vision_layers,
            "num_attention_heads": SMALL.vision_heads,
            "image_size": SMALL.image_size,
            "patch_size": SMALL.patch_size,
            "hidden_act": "quick_gelu",
        },
    )
    torch.manual_seed(0)
    hf = transformers.CLIPModel(hf_cfg).eval()
    params = convert_hf_state_dict(hf.state_dict(), SMALL)
    return hf, params


def test_image_parity(hf_pair):
    hf, params = hf_pair
    rng = np.random.RandomState(1)
    imgs = rng.randn(3, SMALL.image_size, SMALL.image_size, 3).astype(np.float32)
    ours = np.asarray(encode_image(params, SMALL, jnp.asarray(imgs)))
    with torch.no_grad():
        theirs = hf.get_image_features(
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_text_parity(hf_pair):
    hf, params = hf_pair
    eos = SMALL.vocab_size - 1
    rng = np.random.RandomState(2)
    # ids < eos everywhere except one eos per row → HF pools at its first
    # occurrence, ours at argmax (also its first occurrence).
    tokens = rng.randint(1, eos - 1, size=(4, SMALL.context_length)).astype(np.int32)
    lengths = rng.randint(3, SMALL.context_length, size=4)
    for i, l in enumerate(lengths):
        tokens[i, l] = eos
        tokens[i, l + 1 :] = 0
    ours = np.asarray(encode_text(params, SMALL, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = hf.get_text_features(
            input_ids=torch.tensor(tokens.astype(np.int64)),
            attention_mask=torch.ones_like(torch.tensor(tokens.astype(np.int64))),
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_bfloat16_close_to_fp32(hf_pair):
    """bf16 compute (the TPU fast path, standing in for the reference's
    fp16) stays within loose tolerance of fp32 — the 'fp32-tolerance
    parity' requirement of SURVEY §2b for normalized features."""
    _, params = hf_pair
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(
        rng.rand(4, SMALL.image_size, SMALL.image_size, 3).astype(np.float32)
    )
    f32 = encode_image(params, SMALL, imgs, jnp.float32)
    bf16 = encode_image(params, SMALL, imgs, jnp.bfloat16)
    n32 = f32 / jnp.linalg.norm(f32, axis=-1, keepdims=True)
    nbf = bf16 / jnp.linalg.norm(bf16, axis=-1, keepdims=True)
    cos = jnp.sum(n32 * nbf, axis=-1)
    assert float(cos.min()) > 0.99


def test_openai_layout_roundtrip():
    """convert_openai_state_dict inverts the documented OpenAI layout."""
    params = init_clip_params(jax.random.PRNGKey(0), SMALL)

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = {}
    v = params["visual"]
    ps, vw = SMALL.patch_size, SMALL.vision_width
    sd["visual.conv1.weight"] = t(
        np.asarray(v["patch_embed_w"]).reshape(ps, ps, 3, vw).transpose(3, 2, 0, 1)
    )
    sd["visual.class_embedding"] = t(v["class_embedding"])
    sd["visual.positional_embedding"] = t(v["positional_embedding"])
    sd["visual.ln_pre.weight"] = t(v["ln_pre"]["scale"])
    sd["visual.ln_pre.bias"] = t(v["ln_pre"]["bias"])
    sd["visual.ln_post.weight"] = t(v["ln_post"]["scale"])
    sd["visual.ln_post.bias"] = t(v["ln_post"]["bias"])
    sd["visual.proj"] = t(v["proj"])
    tx = params["text"]
    sd["token_embedding.weight"] = t(tx["token_embedding"])
    sd["positional_embedding"] = t(tx["positional_embedding"])
    sd["ln_final.weight"] = t(tx["ln_final"]["scale"])
    sd["ln_final.bias"] = t(tx["ln_final"]["bias"])
    sd["text_projection"] = t(tx["text_projection"])
    for tower, prefix in ((v, "visual.transformer"), (tx, "transformer")):
        for i, blk in enumerate(tower["transformer"]["resblocks"]):
            p = f"{prefix}.resblocks.{i}."
            sd[p + "ln_1.weight"] = t(blk["ln_1"]["scale"])
            sd[p + "ln_1.bias"] = t(blk["ln_1"]["bias"])
            sd[p + "ln_2.weight"] = t(blk["ln_2"]["scale"])
            sd[p + "ln_2.bias"] = t(blk["ln_2"]["bias"])
            sd[p + "attn.in_proj_weight"] = t(blk["attn"]["in_proj_w"])
            sd[p + "attn.in_proj_bias"] = t(blk["attn"]["in_proj_b"])
            sd[p + "attn.out_proj.weight"] = t(blk["attn"]["out_proj_w"])
            sd[p + "attn.out_proj.bias"] = t(blk["attn"]["out_proj_b"])
            sd[p + "mlp.c_fc.weight"] = t(blk["mlp"]["fc_w"])
            sd[p + "mlp.c_fc.bias"] = t(blk["mlp"]["fc_b"])
            sd[p + "mlp.c_proj.weight"] = t(blk["mlp"]["proj_w"])
            sd[p + "mlp.c_proj.bias"] = t(blk["mlp"]["proj_b"])

    converted, cfg = convert_openai_state_dict(sd)
    # head counts aren't recoverable from weight shapes (detect_config uses
    # the width//64 rule that holds for all real CLIP checkpoints)
    import dataclasses

    assert dataclasses.replace(
        cfg, vision_heads=SMALL.vision_heads, text_heads=SMALL.text_heads
    ) == SMALL
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(converted)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

TINY_MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("a", "t</w>"),
    ("e", "n"),
    ("en", "t</w>"),
    ("a", "g"),
    ("ag", "ent</w>"),
    ("i", "n"),
    ("in", "g</w>"),
]


def test_bpe_matches_transformers_clip_tokenizer(tmp_path):
    """Our BPE == HF's CLIPTokenizer given the same merge table."""
    import json

    ours = BPETokenizer(TINY_MERGES)
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(ours.encoder))
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in TINY_MERGES)
    )
    hf_tok = transformers.CLIPTokenizer(str(vocab_file), str(merges_file))

    for text in [
        "the agent at the gate",
        "agent facing right, objects: wall at (0,0)",
        "Pong: ball at (12, 34) moving",
        "a",
        "",
    ]:
        ours_ids = ours.tokenize(text)[0]
        hf_ids = hf_tok(
            text, padding="max_length", max_length=77, truncation=True
        )["input_ids"]
        hf_arr = np.zeros(77, np.int32)
        hf_arr[: len(hf_ids)] = hf_ids
        # HF pads with eot; OpenAI's clip.tokenize zero-pads. Compare the
        # meaningful prefix (through the first EOT).
        end = int(np.argmax(ours_ids == ours.eot_token)) + 1
        np.testing.assert_array_equal(ours_ids[:end], hf_arr[:end])
        assert not ours_ids[end:].any()


def test_bpe_merge_priority():
    tok = BPETokenizer(TINY_MERGES)
    assert tok.bpe("agent") == "agent</w>"
    assert tok.bpe("the") == "the</w>"
    assert tok.decode(tok.encode("the agent")) == "the agent "


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_hash_tokenizer_contract():
    tok = HashTokenizer()
    out = tok.tokenize(["agent at (1,1) facing right"] * 3)
    assert out.shape == (3, 77) and out.dtype == np.int32
    assert (out[0] == out[1]).all()
    assert out[0, 0] == tok.sot_token
    # EOT is the max id in every row → argmax pooling finds it.
    assert out[0].max() == tok.eot_token
    # determinism across instances
    out2 = HashTokenizer().tokenize("agent at (1,1) facing right")
    np.testing.assert_array_equal(out[0], out2[0])


def test_tokenize_truncation():
    tok = HashTokenizer()
    long = "word " * 200
    out = tok.tokenize(long)
    assert out.shape == (1, 77)
    assert out[0, -1] == tok.eot_token
    with pytest.raises(RuntimeError):
        tok.tokenize(long, truncate=False)
