"""IO-layer tests: TensorBoard writer read-back, checkpoint roundtrip."""

import dataclasses
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.io import (
    SummaryWriter,
    hyperparameters_table,
    load_checkpoint,
    save_checkpoint,
)
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.train import PPOConfig, make_optimizer


class TestTBWriter:
    def test_scalars_and_text_readable_by_event_accumulator(self, tmp_path):
        logdir = str(tmp_path / "run1")
        w = SummaryWriter(logdir)
        w.add_text("hyperparameters", hyperparameters_table({"seed": 1}))
        w.add_text("config/disturbance_severity", "MODERATE")
        for step, val in [(1024, 0.5), (2048, 0.75)]:
            w.add_scalar("charts/episodic_return", val, step)
            w.add_scalar("losses/value_loss", val / 2, step)
        w.close()

        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        acc = EventAccumulator(logdir)
        acc.Reload()
        scalars = acc.Scalars("charts/episodic_return")
        assert [s.step for s in scalars] == [1024, 2048]
        assert scalars[1].value == 0.75
        # Severity text readable exactly as `calculate_metrics.py:57-87` does.
        tensors = acc.Tensors("config/disturbance_severity/text_summary")
        text = tensors[0].tensor_proto.string_val[0].decode()
        assert text == "MODERATE"


class TestCheckpoint:
    def test_roundtrip_with_reference_schema(self, tmp_path):
        params = init_agent_params(jax.random.PRNGKey(0), 7)
        cfg = PPOConfig()
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)

        @dataclasses.dataclass
        class Args:
            seed: int = 3
            env_id: str = "MiniGrid-Empty-5x5-v0"

        prefix = str(tmp_path / "run_name")
        returns = np.arange(8.0, dtype=np.float32)
        save_checkpoint(prefix, params, opt_state, 5, 5120, Args(), returns)
        assert os.path.exists(f"{prefix}_step_5120.ckpt")
        assert os.path.exists(f"{prefix}_latest.ckpt")

        # Load back into perturbed templates; values must match originals.
        params2 = init_agent_params(jax.random.PRNGKey(99), 7)
        opt_state2 = opt.init(params2)
        lp, lo, it, gs, raw = load_checkpoint(
            f"{prefix}_latest.ckpt", params2, opt_state2
        )
        assert (it, gs) == (5, 5120)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            lp, params,
        )
        assert raw["args"]["env_id"] == "MiniGrid-Empty-5x5-v0"
        assert raw["training_complete"] is False
        np.testing.assert_array_equal(raw["returns"], returns)

    def test_final_and_extra_models(self, tmp_path):
        params = init_agent_params(jax.random.PRNGKey(0), 7, with_temporal_projection=True)
        cfg = PPOConfig()
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        prefix = str(tmp_path / "final_run")
        save_checkpoint(
            prefix, params, opt_state, 10, 10240, {"seed": 1}, final=True,
            extra_models={"temporal_projection": params["temporal_projection"]},
        )
        assert os.path.exists(f"{prefix}_final.ckpt")
        import pickle

        with open(f"{prefix}_final.ckpt", "rb") as f:
            raw = pickle.load(f)
        assert raw["training_complete"] is True
        assert "temporal_projection_state" in raw


def test_pt_extension_env_var(tmp_path, monkeypatch):
    """CLIP_PPO_CKPT_EXT=.pt names files like the reference
    (`checkpoint_utils.py:37-46`); payload unchanged."""
    import pickle

    from clip_ppo_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    monkeypatch.setenv("CLIP_PPO_CKPT_EXT", ".pt")
    params = {"w": np.ones((2, 2), np.float32)}
    opt_state = {"m": np.zeros(2, np.float32)}
    prefix = str(tmp_path / "run")
    path = save_checkpoint(prefix, params, opt_state, 3, 4096, {"seed": 1})
    assert path.endswith("_step_4096.pt")
    assert (tmp_path / "run_latest.pt").exists()
    final = save_checkpoint(prefix, params, opt_state, 5, 8192, {"seed": 1},
                            final=True)
    assert final.endswith("_final.pt")
    with open(final, "rb") as f:
        ckpt = pickle.load(f)
    assert ckpt["training_complete"] is True
    p2, o2, it, gs, _ = load_checkpoint(final, params, opt_state)
    assert it == 5 and gs == 8192
