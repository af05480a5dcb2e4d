"""Vanilla PPO on Atari — flag-compatible with the reference
`atari_experiments/ppo/ppo_atari.py`, rebuilt TPU-native.

The reference drives the host-side ALE C++ emulator through an 8-wrapper
stack and syncs host↔device every step; here the games are pure-JAX
(`clip_ppo_tpu.envs.atari`) so the whole iteration — rollout with the
4-frame stack, GAE, and the 4×4 minibatch update — is one XLA program.
Like the reference script: no disturbances, no checkpointing
(`ppo_atari.py` has neither), same hyperparameters, same TB tag set.
"""

from __future__ import annotations

import dataclasses
import random
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from clip_ppo_tpu.cli._distributed import NullWriter, setup_mesh
from clip_ppo_tpu.cli._logging import IterationLogger
from clip_ppo_tpu.envs import AtariVectorEnv
from clip_ppo_tpu.io import (
    ProfilerWindow,
    SummaryWriter,
    VideoRecorder,
    hyperparameters_table,
    maybe_init_wandb,
)
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.train import LogPipeline, PPOConfig, Trainer, chunk_length
from clip_ppo_tpu.utils import flags


@dataclass
class Args:
    exp_name: str = "ppo_atari"
    """the name of this experiment"""
    seed: int = 1
    """seed of the experiment"""
    torch_deterministic: bool = True
    """accepted for flag parity; JAX is deterministic by construction"""
    cuda: bool = False
    """accepted for flag parity (the reference defaults Atari to CPU)"""
    track: bool = False
    """if toggled, this experiment will be tracked with Weights and Biases"""
    wandb_project_name: str = "cleanRL"
    """the wandb's project name"""
    wandb_entity: Optional[str] = None
    """the entity (team) of wandb's project"""
    capture_video: bool = True
    """whether to capture videos of the agent performances"""
    profile_dir: Optional[str] = None
    """capture a jax.profiler trace of steady-state iterations to this dir"""

    # Algorithm specific arguments
    env_id: str = "BreakoutNoFrameskip-v4"
    """the id of the environment"""
    total_timesteps: int = 100000
    """total timesteps of the experiments"""
    learning_rate: float = 2.5e-4
    """the learning rate of the optimizer"""
    num_envs: int = 8
    """the number of parallel game environments"""
    num_steps: int = 128
    """the number of steps to run in each environment per policy rollout"""
    anneal_lr: bool = True
    """Toggle learning rate annealing for policy and value networks"""
    gamma: float = 0.99
    """the discount factor gamma"""
    gae_lambda: float = 0.95
    """the lambda for the general advantage estimation"""
    num_minibatches: int = 4
    """the number of mini-batches"""
    update_epochs: int = 4
    """the K epochs to update the policy"""
    norm_adv: bool = True
    """Toggles advantages normalization"""
    clip_coef: float = 0.1
    """the surrogate clipping coefficient"""
    clip_vloss: bool = True
    """Toggles whether or not to use a clipped loss for the value function"""
    ent_coef: float = 0.01
    """coefficient of the entropy"""
    vf_coef: float = 0.5
    """coefficient of the value function"""
    max_grad_norm: float = 0.5
    """the maximum norm for the gradient clipping"""
    target_kl: Optional[float] = None
    """the target KL divergence threshold"""

    # TPU execution arguments (no reference equivalent — single-device there)
    num_devices: int = 1
    """data-parallel device count (0 = all available); envs and the PPO
    batch are sharded across a dp mesh, parameters replicated"""
    distributed: bool = False
    """multi-host data-parallel training: bring up jax.distributed
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or TPU
    pod auto-detection) and span the dp mesh over every host's devices;
    only process 0 writes TB/videos/checkpoints"""
    iterations_per_dispatch: int = 8
    """training iterations fused into one device dispatch (amortizes the
    host round trip; logging/checkpoint semantics are unchanged)"""
    env_backend: str = "jax"
    """'jax' = pure-JAX device envs (whole iteration is one XLA program);
    'ale' = the host-side emulator through the exact reference wrapper
    stack (requires ale_py, or a registered ALE-compatible env id such as
    the FakeALE/Breakout-v5 CI stub)"""

    # to be filled in runtime
    batch_size: int = 0
    """the batch size (computed in runtime)"""
    minibatch_size: int = 0
    """the mini-batch size (computed in runtime)"""
    num_iterations: int = 0
    """the number of iterations (computed in runtime)"""


def train(args: Args, run_name: Optional[str] = None) -> dict:
    """Run training; returns summary stats (for tests/benchmarks)."""
    args.batch_size = int(args.num_envs * args.num_steps)
    args.minibatch_size = int(args.batch_size // args.num_minibatches)
    args.num_iterations = args.total_timesteps // args.batch_size
    run_name = run_name or f"{args.env_id}__{args.exp_name}__{args.seed}__{int(time.time())}"

    if args.distributed and args.env_backend == "ale":
        raise ValueError(
            "--distributed applies to the device-resident (jax) backend; "
            "the host/ALE path is single-process"
        )
    # Mesh first: jax.distributed must initialize before any computation.
    mesh, is_main = setup_mesh(args.distributed, args.num_devices)
    if mesh is not None and is_main:
        print(f"Data-parallel over {mesh.shape['dp']} devices "
              f"({args.num_envs} envs sharded)")

    if is_main:
        maybe_init_wandb(args, run_name)
    writer = SummaryWriter(f"runs/{run_name}") if is_main else NullWriter()
    recorder = (
        VideoRecorder(f"videos/atari/{run_name}")
        if args.capture_video and is_main else None
    )
    profiler = ProfilerWindow(args.profile_dir)
    writer.add_text("hyperparameters", hyperparameters_table(dataclasses.asdict(args)))

    random.seed(args.seed)
    np.random.seed(args.seed)

    cfg = PPOConfig(
        learning_rate=args.learning_rate,
        num_envs=args.num_envs,
        num_steps=args.num_steps,
        anneal_lr=args.anneal_lr,
        gamma=args.gamma,
        gae_lambda=args.gae_lambda,
        num_minibatches=args.num_minibatches,
        update_epochs=args.update_epochs,
        norm_adv=args.norm_adv,
        clip_coef=args.clip_coef,
        clip_vloss=args.clip_vloss,
        ent_coef=args.ent_coef,
        vf_coef=args.vf_coef,
        max_grad_norm=args.max_grad_norm,
        target_kl=args.target_kl,
    )

    if args.env_backend == "ale":
        result = _train_ale(args, cfg, run_name, writer, recorder, profiler)
        profiler.close()
        if recorder is not None:
            recorder.close()
        writer.close()
        return result

    env = AtariVectorEnv(args.env_id, args.num_envs)

    trainer = Trainer(
        cfg, env, num_iterations=args.num_iterations,
        capture_env0=args.capture_video,
        mesh=mesh,
    )
    params = init_agent_params(
        jax.random.PRNGKey(args.seed), env.num_actions, in_channels=4
    )
    state = trainer.init_state(params, args.seed)

    logger = IterationLogger(
        writer, profiler, recorder, num_envs=args.num_envs,
        batch_size=args.batch_size, num_iterations=args.num_iterations,
        echo_episodes=True,  # CleanRL's vanilla-Atari per-episode print
        quiet=not is_main,
    )

    # K iterations per device dispatch, one packed host fetch per chunk,
    # overlapped with the next chunk's compute (LogPipeline). ppo_atari
    # has no checkpointing (like the reference), so chunks only cap at
    # the final iteration and the pipeline never flushes mid-run.
    pipeline = LogPipeline(trainer, logger.handle)
    iteration = 1
    while iteration <= args.num_iterations:
        k = chunk_length(
            args.iterations_per_dispatch, iteration, args.num_iterations,
            (iteration - 1) * args.batch_size, args.batch_size,
            save_freq=1, save_model=False,
        )
        state, packed = trainer.run_iterations(state, iteration, k)
        pipeline.after_dispatch(iteration, packed)
        iteration += k
    pipeline.flush()

    profiler.close()
    if recorder is not None:
        recorder.close()
    env.close()
    writer.close()
    return {
        "global_step": logger.global_step,
        "sps": logger.sps,
        "recent_returns": logger.last_returns[-100:],
        "run_name": run_name,
    }


def _train_ale(args: Args, cfg: PPOConfig, run_name: str, writer, recorder,
               profiler) -> dict:
    """Host-emulator backend: the reference loop shape over the exact ALE
    wrapper stack (`ppo_atari.py:154-337`), jitted policy/update on device
    (`clip_ppo_tpu.train.HostTrainer`)."""
    from clip_ppo_tpu.envs.atari.ale_adapter import ALEVectorEnv
    from clip_ppo_tpu.train import HostTrainer

    env = ALEVectorEnv(args.env_id, args.num_envs, run_name=run_name)
    frame_fn = env.frame_env0 if (args.capture_video and recorder is not None) else None
    trainer = HostTrainer(
        cfg, env, num_iterations=args.num_iterations, frame_fn=frame_fn
    )
    params = init_agent_params(
        jax.random.PRNGKey(args.seed), env.num_actions, in_channels=4
    )
    state = trainer.init_state(params, args.seed)

    logger = IterationLogger(
        writer, profiler, recorder, num_envs=args.num_envs,
        batch_size=args.batch_size, num_iterations=args.num_iterations,
        echo_episodes=True,
    )
    for iteration in range(1, args.num_iterations + 1):
        state, scalars, episodes, extras = trainer.run_iteration(state, iteration)
        logger.log_host_iteration(iteration, scalars, episodes, extras)

    env.close()
    return {
        "global_step": logger.global_step,
        "sps": logger.sps,
        "recent_returns": logger.last_returns[-100:],
        "run_name": run_name,
    }


def main() -> None:
    train(flags.parse(Args))


if __name__ == "__main__":
    main()
