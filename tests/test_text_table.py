"""Fused text modality via the precomputed description-embedding table.

MiniGrid descriptions are f(agent_x, agent_y, dir) + a constant
border-wall suffix (`clip_ppo_minigrid.py:164-211` scans x-major, so the
first 3 non-empty cells are always the x=0 border walls). The table path
must therefore be an exact stand-in for per-step host tokenization.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as mg
from clip_ppo_tpu.models import clip_utils
from clip_ppo_tpu.models.clip import CLIPConfig
from clip_ppo_tpu.models.clip.model import init_clip_params

TINY = CLIPConfig(
    embed_dim=512, image_size=224, patch_size=56, vision_width=64,
    vision_layers=1, vision_heads=2, context_length=77, vocab_size=49408,
    text_width=64, text_heads=2, text_layers=1,
)


@pytest.fixture
def tiny(monkeypatch):
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    monkeypatch.setattr(
        clip_utils, "load_clip_model", lambda *a, **k: (params, TINY)
    )
    return params


def test_suffix_is_constant_across_resets():
    for env_id in ("MiniGrid-Empty-8x8-v0", "MiniGrid-DoorKey-5x5-v0",
                   "MiniGrid-FourRooms-v0", "MiniGrid-LavaGapS5-v0",
                   # random-layout families: every object lands in the
                   # interior, so the x=0 border suffix stays constant
                   # and the fused table engages
                   "MiniGrid-LockedRoom-v0", "MiniGrid-MemoryS13-v0",
                   "MiniGrid-ObstructedMaze-Full-v0",
                   "MiniGrid-Playground-v0"):
        p = mg.parse_env_id(env_id)
        suffixes = {
            mg._objects_suffix(np.asarray(mg.reset(p, jax.random.PRNGKey(s)).grid))
            for s in range(4)
        }
        assert len(suffixes) == 1, env_id
        assert "wall at (0,0)" in next(iter(suffixes))


def test_table_gather_matches_direct_encode(tiny):
    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 2)
    p = env.params
    grid = np.asarray(mg.reset(p, jax.random.PRNGKey(0)).grid)
    suffix = mg._objects_suffix(grid)
    table = clip_utils.build_minigrid_text_table(
        tiny, TINY, p.width, p.height, suffix
    )
    assert table.shape == (p.width * p.height * 4, TINY.embed_dim)

    # a handful of concrete states: gather == encode of the exact string
    embed = clip_utils.make_text_table_embed_fn(p.height)
    desc = {
        "agent_pos": jnp.array([[[1, 2], [3, 1]]]),  # [T=1, N=2, 2]
        "agent_dir": jnp.array([[0, 3]]),
    }
    got = embed(desc, {"text_table": table})
    strings = [
        "agent at (1,2) facing right" + suffix,
        "agent at (3,1) facing up" + suffix,
    ]
    want = clip_utils.encode_texts(tiny, TINY, strings)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_text_training_matches_split_path(tmp_path, monkeypatch, tiny):
    """End-to-end: the fused table path and the reference-shaped split
    path produce the same training trajectory (same PRNG stream, same
    embeddings up to batched-encode float noise)."""
    from clip_ppo_tpu.cli import clip_ppo_minigrid as cpm

    def run(table: bool, name: str):
        monkeypatch.chdir(tmp_path)
        args = cpm.Args(
            env_id="MiniGrid-Empty-5x5-v0", seed=3,
            total_timesteps=64, num_envs=2, num_steps=8,
            num_minibatches=2, update_epochs=1,
            capture_video=False, verbose=False, save_model=False,
            text_embed_table=table,
            clip_config=cpm.MiniGridClipPPOConfig(clip_lambda=1e-5),
        )
        out = cpm.train(args, run_name=name)
        return out

    a = run(True, "tbl")
    b = run(False, "split")
    assert a["global_step"] == b["global_step"] == 64
    # same PRNG stream through both loop shapes → identical rollouts and
    # episode returns (the MiniGrid CLIP term is a stop-gradient monitor,
    # so identical policies is the correct expectation)
    assert a["recent_returns"] == b["recent_returns"]
