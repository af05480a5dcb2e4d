"""Vanilla PPO on MiniGrid — flag-compatible with the reference
`minigrid_experiments/ppo/ppo_minigrid.py`, rebuilt TPU-native.

The rollout, GAE and the 4×4 minibatch update compile into ONE XLA
program per iteration (env included — the MiniGrid lives on-device), so
there is no per-step host↔device sync. TensorBoard tags, checkpoint
payloads/naming, derived batch sizes, the save-frequency divisibility
quirk, and the CLI surface match the reference exactly.

Usage:
    python -m clip_ppo_tpu.cli.ppo_minigrid --total-timesteps 100000
"""

from __future__ import annotations

import dataclasses
import os
import random
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from clip_ppo_tpu.cli._distributed import NullWriter, setup_mesh
from clip_ppo_tpu.cli._logging import IterationLogger
from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.io import (
    ProfilerWindow,
    SummaryWriter,
    VideoRecorder,
    hyperparameters_table,
    maybe_init_wandb,
    save_checkpoint,
)
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.ops import DisturbanceSeverity, resolve_params
from clip_ppo_tpu.train import LogPipeline, PPOConfig, Trainer, chunk_length
from clip_ppo_tpu.utils import flags


@dataclass
class Args:
    exp_name: str = "ppo_minigrid"
    """the name of this experiment"""
    seed: int = 1
    """seed of the experiment"""
    torch_deterministic: bool = True
    """accepted for flag parity; JAX is deterministic by construction"""
    cuda: bool = True
    """accepted for flag parity; device selection is JAX's platform"""
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
    env_id: str = "MiniGrid-Empty-16x16-v0"
    """the id of the environment"""
    total_timesteps: int = 5_000_000
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

    # Model saving arguments
    save_model: bool = True
    """whether to save model checkpoints"""
    save_freq: int = 100000
    """save model every N timesteps"""
    model_path: str = "checkpoints"
    """directory to save model checkpoints"""

    resume_checkpoint: str = ""
    """path to checkpoint file to resume training from (surface modeled on
    `clip_ppo_minigrid.py:130-131`; the reference's vanilla script has no
    resume). Restores the FULL TrainState — params, optimizer, env/loop
    state, SimHash visit counts, LSTM carry — so the resumed run continues
    bit-identically with an uninterrupted one"""

    # Visual disturbance arguments
    apply_disturbances: bool = False
    """whether to apply visual disturbances during training"""
    disturbance_severity: str = "MILD"
    """disturbance severity level: MILD, MODERATE, SEVERE"""

    # Recurrent agent (no reference equivalent — its agents are all
    # feed-forward; the Memory family needs recurrence, docs/PERFORMANCE.md)
    recurrent: bool = False
    """insert an LSTM between the CNN trunk and the actor/critic heads
    (CleanRL ppo_atari_lstm-style; solves MiniGrid-Memory)"""
    lstm_hidden: int = 128
    """LSTM hidden size for --recurrent"""

    # Mission conditioning (no reference equivalent — the reference drops
    # the mission via ImgObsWrapper, `ppo_minigrid.py:110`; upstream
    # BabyAI's instruction-following levels need it, models/mission.py)
    mission_conditioning: bool = False
    """FiLM-condition the policy/value trunk on the env's structured
    instruction (EnvState.target/instr) — required to learn the
    instruction-following MiniGrid/BabyAI families past their
    mission-blind guess ceilings"""

    # Count-based exploration (no reference equivalent — LockedRoom /
    # ObstructedMaze are honest negatives under vanilla PPO there too)
    exploration_bonus: float = 0.0
    """β > 0 adds a SimHash count bonus β/sqrt(N(obs bucket)) to the env
    reward before GAE (Tang et al. 2017; train/exploration.py)"""
    exploration_bits: int = 18
    """SimHash bucket bits for --exploration-bonus (table size 2^bits)"""
    episodic_bonus: float = 0.0
    """β_e > 0 adds an NGU-style first-visit-THIS-EPISODE bonus over the
    same SimHash buckets (cracks per-episode-randomized layouts the
    global table dilutes across; composable with --exploration-bonus)"""
    bonus_decay: float = 0.0
    """> 0 anneals the total intrinsic reward linearly to zero over the
    first `bonus_decay` fraction of training (1.0 = the full run) — lets
    the bonus fund discovery early while the terminal reward alone
    shapes the final policy"""

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

    # Mesh first: jax.distributed must initialize before any computation.
    mesh, is_main = setup_mesh(args.distributed, args.num_devices)
    if mesh is not None and is_main:
        print(f"Data-parallel over {mesh.shape['dp']} devices "
              f"({args.num_envs} envs sharded)")

    if is_main:
        maybe_init_wandb(args, run_name)
    writer = SummaryWriter(f"runs/{run_name}") if is_main else NullWriter()
    recorder = (
        VideoRecorder(f"videos/minigrid/ppo/{run_name}")
        if args.capture_video and is_main else None
    )
    profiler = ProfilerWindow(args.profile_dir)
    writer.add_text("hyperparameters", hyperparameters_table(dataclasses.asdict(args)))

    random.seed(args.seed)
    np.random.seed(args.seed)

    env = JaxVectorEnv(args.env_id, args.num_envs)
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

    disturbance = None
    if args.apply_disturbances:
        # The vanilla script uses the per-image pipeline
        # (`ppo_minigrid.py:206-211,260-263`).
        disturbance = resolve_params(DisturbanceSeverity[args.disturbance_severity])
        print(f"Disturbances enabled with severity: {args.disturbance_severity}")
    else:
        print("Disturbances disabled")

    trainer = Trainer(
        cfg,
        env,
        num_iterations=args.num_iterations,
        disturbance=disturbance,
        disturbance_semantics="per_image",
        capture_env0=args.capture_video,
        mesh=mesh,
        recurrent=args.recurrent,
        exploration_bonus=args.exploration_bonus,
        exploration_bits=args.exploration_bits,
        episodic_bonus=args.episodic_bonus,
        bonus_decay=args.bonus_decay,
        mission_conditioning=args.mission_conditioning,
    )
    if args.recurrent:
        from clip_ppo_tpu.models.recurrent import init_agent_params_recurrent

        params = init_agent_params_recurrent(
            jax.random.PRNGKey(args.seed), env.num_actions, in_channels=3,
            lstm_hidden=args.lstm_hidden,
            mission_dim=env.mission_dim if args.mission_conditioning else 0,
        )
    else:
        params = init_agent_params(
            jax.random.PRNGKey(args.seed), env.num_actions, in_channels=3,
            mission_dim=env.mission_dim if args.mission_conditioning else 0,
        )
    state = trainer.init_state(params, args.seed)

    def state_extras(st):
        """Extra checkpoint payload: every TrainState leaf beyond
        params/opt_state, so resume continues bit-identically. `counts`
        (SimHash table) and `lstm_carry` are the leaves the reference
        payload (`checkpoint_utils.py:21-29`) has no slot for —
        `extra_models` is its own extension mechanism. Multi-host runs
        skip this (env shards aren't host-local) and resume with the
        reference's fresh-reset semantics instead."""
        if jax.process_count() > 1:
            return None
        extras = {"loop": {
            "vec_state": st.vec_state, "obs": st.obs,
            "next_done": st.next_done, "key": st.key,
        }}
        if st.counts is not None:
            extras["counts"] = st.counts
        if st.episodic_mem is not None:
            extras["episodic_mem"] = st.episodic_mem
        if st.lstm_state is not None:
            extras["lstm_carry"] = st.lstm_state
        return extras

    checkpoint_path = None
    if args.save_model:
        os.makedirs(args.model_path, exist_ok=True)
        checkpoint_path = os.path.join(args.model_path, run_name)

    start_iteration = 1
    resumed_global_step = 0
    if args.resume_checkpoint:
        from clip_ppo_tpu.io import load_checkpoint

        templates = state_extras(state) or {}
        params, opt_state, it, resumed_global_step, raw = load_checkpoint(
            args.resume_checkpoint, state.params, state.opt_state,
            extra_templates=templates,
        )
        state = dataclasses.replace(state, params=params, opt_state=opt_state)
        extras = raw.get("extras", {})
        if "loop" in extras:
            loop = extras["loop"]
            state = dataclasses.replace(
                state, vec_state=loop["vec_state"], obs=loop["obs"],
                next_done=loop["next_done"], key=loop["key"],
            )
        if "counts" in extras:
            state = dataclasses.replace(state, counts=extras["counts"])
        if "episodic_mem" in extras:
            state = dataclasses.replace(
                state, episodic_mem=extras["episodic_mem"])
        if "lstm_carry" in extras:
            state = dataclasses.replace(state, lstm_state=extras["lstm_carry"])
        state = trainer.shard_state(state)  # re-lay out on the dp mesh
        start_iteration = it + 1

    logger = IterationLogger(
        writer, profiler, recorder, num_envs=args.num_envs,
        batch_size=args.batch_size, num_iterations=args.num_iterations,
        quiet=not is_main,
        log_intrinsic=args.exploration_bonus > 0.0 or args.episodic_bonus > 0.0,
    )
    logger.global_step = resumed_global_step  # 0 or the resumed checkpoint's

    # K iterations per device dispatch (one host round trip per chunk,
    # chunk ends aligned to checkpoint boundaries) with the packed-log
    # fetch of each chunk overlapped with the next chunk's device compute.
    pipeline = LogPipeline(trainer, logger.handle)
    iteration = start_iteration
    while iteration <= args.num_iterations:
        k = chunk_length(
            args.iterations_per_dispatch, iteration, args.num_iterations,
            (iteration - 1) * args.batch_size, args.batch_size,
            args.save_freq, args.save_model,
        )
        state, packed = trainer.run_iterations(state, iteration, k)
        pipeline.after_dispatch(iteration, packed)
        iteration += k
        # The handler lags one chunk behind the device; the save condition
        # comes from the dispatched frontier and the pipeline is flushed
        # only when a save is actually due (global_step/b_returns current).
        if (args.save_model and is_main
                and ((iteration - 1) * args.batch_size) % args.save_freq == 0):
            pipeline.flush()
            save_checkpoint(
                checkpoint_path, state.params, state.opt_state,
                iteration - 1, logger.global_step, args,
                b_returns=logger.b_returns,
                extra_models=state_extras(state),
            )
    pipeline.flush()

    if args.save_model and is_main:
        save_checkpoint(
            checkpoint_path, state.params, state.opt_state,
            args.num_iterations, logger.global_step, args,
            b_returns=logger.b_returns,
            final=True,
            extra_models=state_extras(state),
        )

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


def main() -> None:
    train(flags.parse(Args))


if __name__ == "__main__":
    main()
