"""CLIP-PPO on Atari — flag-compatible with the reference
`atari_experiments/clip_ppo/clip_ppo_atari.py`, rebuilt TPU-native.

Gradient topology matches the reference exactly (SURVEY §7 hard part 4):
PPO latents are stop-gradient'd (`clip_ppo_atari.py:244-246`); in the
image modality the per-frame CLIP features are precomputed under
no-grad as a [B, 4·512] concat (`process_multiframe_clip_embeddings`,
`:272-299`) and pushed through the trainable ``temporal_projection``
*inside* the minibatch loss (`:726-731`), so the CLIP-alignment gradient
flows ONLY into the projection. In the text modality the loss is a pure
monitor. Per-frame GPU-batch disturbances on the 4-stack use the
``stack_frames`` semantics (`:568-584`).

TPU-native mechanism notes:
* the 1024×4-frame CLIP encode is ONE batched ViT pass fused into the
  jitted iteration (the reference's dominant CLIP cost, SURVEY §3 hot
  loop c);
* text descriptions come from true game state with the reference's RAM
  coordinate semantics, generated once per iteration and tiled across
  steps exactly like the reference's ``i % num_envs`` cycling
  (`clip_ppo_atari.py:648`, `:321-322`);
* ``temporal_projection`` lives inside the agent params pytree, so the
  reference's ``extra_models={'temporal_projection'}`` checkpoint payload
  (`:542-550,782-786`) is carried by ``agent_state`` with identical
  restore behavior.
"""

from __future__ import annotations

import dataclasses
import os
import random
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from clip_ppo_tpu.cli._distributed import NullWriter, setup_mesh
from clip_ppo_tpu.cli._logging import IterationLogger
from clip_ppo_tpu.envs import AtariVectorEnv
from clip_ppo_tpu.io import (
    ProfilerWindow,
    VideoRecorder,
    maybe_init_wandb,
    SummaryWriter,
    hyperparameters_table,
    load_checkpoint,
    save_checkpoint,
)
from clip_ppo_tpu.models import clip_utils, init_agent_params
from clip_ppo_tpu.models.agent import AblationMode, cnn_features
from clip_ppo_tpu.models.clip import model as clip_model_mod
from clip_ppo_tpu.models.clip.tokenizer import tokenize
from clip_ppo_tpu.ops import DisturbanceSeverity, resolve_params
from clip_ppo_tpu.train import LogPipeline, PPOConfig, Trainer, chunk_length
from clip_ppo_tpu.utils import flags


@dataclass
class AtariClipPPOConfig(clip_utils.ClipPPOConfig):
    """Atari-specific CLIP-PPO defaults (`clip_ppo_atari.py:46-62`)."""

    clip_lambda: float = 0.00001
    """coefficient for CLIP alignment loss"""
    clip_modality: str = "image"
    """CLIP modality to use for alignment (image better for Atari visual scenes)"""
    ablation_mode: AblationMode = AblationMode.NONE
    """ablation mode for controlled experiments"""
    apply_disturbances: bool = False
    """whether to apply visual disturbances during training"""
    disturbance_severity: str = "MODERATE"
    """disturbance severity level: MILD, MODERATE, HARD, SEVERE"""


@dataclass
class Args:
    exp_name: str = "clip_ppo_atari"
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
    verbose: bool = True
    """enable verbose debug output for losses"""

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

    # CLIP-PPO configuration
    clip_config: AtariClipPPOConfig = field(default_factory=AtariClipPPOConfig)
    """Atari-specific CLIP-PPO configuration"""

    # Run naming arguments
    run_name: Optional[str] = None
    """custom run name (if empty, uses default format)"""

    # Model saving arguments
    save_model: bool = True
    """whether to save model checkpoints"""
    save_freq: int = 100000
    """save model every N timesteps"""
    model_path: str = "checkpoints"
    """directory to save model checkpoints"""
    resume_checkpoint: str = ""
    """path to checkpoint file to resume training from"""

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
    """training iterations fused into one device dispatch (fused paths
    only; the text modality runs per-iteration around host tokenization)"""
    env_backend: str = "jax"
    """'jax' = pure-JAX device envs (whole iteration is one XLA program);
    'ale' = the host-side emulator through the exact reference wrapper
    stack with per-frame disturbances, RAM descriptions, CLIP loss and
    temporal-projection checkpointing (requires ale_py, or a registered
    ALE-compatible env id such as the FakeALE/Breakout-v5 CI stub)"""
    rollout_groups: int = 2
    """ale backend only: split the vector env into this many groups and
    pipeline host env stepping against the in-flight device policy
    compute (rollout contents are schedule-independent; 1 = serial)"""

    # to be filled in runtime
    batch_size: int = 0
    """the batch size (computed in runtime)"""
    minibatch_size: int = 0
    """the mini-batch size (computed in runtime)"""
    num_iterations: int = 0
    """the number of iterations (computed in runtime)"""


def train(args: Args, run_name: Optional[str] = None) -> dict:
    """Run CLIP-PPO Atari training; returns summary stats."""
    args.batch_size = int(args.num_envs * args.num_steps)
    args.minibatch_size = int(args.batch_size // args.num_minibatches)
    args.num_iterations = args.total_timesteps // args.batch_size
    cc = args.clip_config
    run_name = (
        run_name
        or args.run_name
        or f"{args.env_id}__{args.exp_name}__{args.seed}__{int(time.time())}"
    )

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
    writer.add_text(
        "config/disturbance_severity",
        cc.disturbance_severity if cc.apply_disturbances else "CLEAN",
    )

    random.seed(args.seed)
    np.random.seed(args.seed)

    compute_clip = clip_utils.should_compute_clip_loss(cc.ablation_mode, cc.clip_lambda)
    clip_params, clip_cfg = (None, None)
    if compute_clip or cc.ablation_mode == AblationMode.FROZEN_CLIP:
        clip_params, clip_cfg = clip_utils.load_clip_model(cc.clip_model)

    # temporal_projection exists when frozen-CLIP is the trunk or the image
    # modality projects concat embeddings (`clip_ppo_atari.py:183-187`).
    image_modality = compute_clip and cc.clip_modality == "image"
    needs_projection = image_modality or cc.ablation_mode == AblationMode.FROZEN_CLIP

    frozen_params = {"clip": clip_params} if clip_params is not None else None
    if cc.ablation_mode == AblationMode.FROZEN_CLIP:
        features_fn = clip_utils.make_frozen_clip_stack_features_fn(clip_cfg)
    else:
        features_fn = cnn_features

    disturbance = None
    if cc.apply_disturbances:
        disturbance = resolve_params(DisturbanceSeverity[cc.disturbance_severity])
        print(f"Disturbances enabled with severity: {cc.disturbance_severity}")
    else:
        print("Disturbances disabled")

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
        clip_mode=(
            "projected" if image_modality else ("precomputed" if compute_clip else "none")
        ),
    )

    embed_images_fn = None
    if image_modality and cc.ablation_mode != AblationMode.RANDOM_ENCODER:
        # Fused per-iteration multi-frame CLIP encode, [B,H,W,4] → [B, 4·512]
        # with per-frame L2 norm (`generate_clip_embeddings` normalizes per
        # frame before concat, `clip_ppo_atari.py:272-299`).
        embed_images_fn = clip_utils.make_multiframe_embed_fn(clip_cfg)

    # RANDOM_ENCODER in-graph (per-frame layout for the image modality,
    # `process_multiframe_clip_embeddings` with RANDOM mode).
    embed_random_fn = None
    if compute_clip and cc.ablation_mode == AblationMode.RANDOM_ENCODER:
        frames = 4 if cc.clip_modality == "image" else 1
        embed_random_fn = clip_utils.make_random_embed_fn(
            args.batch_size, frames=frames
        )

    if args.env_backend == "ale":
        result = _train_ale(
            args, cfg, run_name, writer, recorder, profiler,
            compute_clip=compute_clip,
            clip_params=clip_params, clip_cfg=clip_cfg,
            frozen_params=frozen_params, features_fn=features_fn,
            embed_images_fn=embed_images_fn, disturbance=disturbance,
            needs_projection=needs_projection,
        )
        profiler.close()
        if recorder is not None:
            recorder.close()
        writer.close()
        return result

    env = AtariVectorEnv(args.env_id, args.num_envs)

    trainer = Trainer(
        cfg,
        env,
        num_iterations=args.num_iterations,
        disturbance=disturbance,
        disturbance_semantics="stack_frames",
        features_fn=features_fn,
        embed_images_fn=embed_images_fn,
        embed_random_fn=embed_random_fn,
        clip_lambda=cc.clip_lambda,
        capture_env0=args.capture_video,
        frozen_params=frozen_params,
        mesh=mesh,
    )
    params = init_agent_params(
        jax.random.PRNGKey(args.seed),
        env.num_actions,
        in_channels=4,
        with_temporal_projection=needs_projection,
    )
    state = trainer.init_state(params, args.seed)

    encode_tokens = None
    if compute_clip and cc.clip_modality == "text":
        _encode = jax.jit(
            lambda cp, toks: clip_utils.l2_normalize(
                clip_model_mod.encode_text(cp, clip_cfg, toks)
            )
        )
        encode_tokens = lambda toks: _encode(clip_params, toks)

    checkpoint_path = None
    if args.save_model:
        os.makedirs(args.model_path, exist_ok=True)
        checkpoint_path = os.path.join(args.model_path, run_name)

    start_iteration = 1
    global_step = 0
    if args.resume_checkpoint:
        params, opt_state, it, global_step, _ = load_checkpoint(
            args.resume_checkpoint, state.params, state.opt_state
        )
        state = dataclasses.replace(state, params=params, opt_state=opt_state)
        state = trainer.shard_state(state)  # re-lay out on the dp mesh
        start_iteration = it + 1

    rand_key = jax.random.PRNGKey(args.seed + 1)
    use_split_path = (
        compute_clip and embed_images_fn is None and embed_random_fn is None
    )

    logger = IterationLogger(
        writer, profiler, recorder, num_envs=args.num_envs,
        batch_size=args.batch_size, num_iterations=args.num_iterations,
        log_clip_loss=True,
        verbose_fn=(
            (lambda it, scalars: clip_utils.verbose_debug_print(
                it, cc.clip_lambda, args.ent_coef, args.vf_coef, scalars))
            if compute_clip and args.verbose else None
        ),
        quiet=not is_main,
    )
    logger.global_step = global_step  # 0 or the resumed checkpoint's

    pipeline = LogPipeline(trainer, logger.handle)
    iteration = start_iteration
    while iteration <= args.num_iterations:
        if use_split_path:
            # Host tokenization sits between the two jitted halves, so the
            # split path runs one iteration per dispatch.
            k = 1
            state, flat, episode_stats, _desc = trainer.run_rollout_half(state)
            if cc.ablation_mode == AblationMode.RANDOM_ENCODER:
                rand_key, kk = jax.random.split(rand_key)
                if cc.clip_modality == "image":
                    # random per-frame embeddings, concat to [B, 4·512]
                    # (`process_multiframe_clip_embeddings` with RANDOM mode)
                    emb = clip_utils.generate_clip_embeddings(
                        AblationMode.RANDOM_ENCODER, None, None, "image",
                        args.batch_size * 4, key=kk,
                    )
                    clip_embeddings = emb.reshape(args.batch_size, -1)
                else:
                    clip_embeddings = clip_utils.generate_clip_embeddings(
                        AblationMode.RANDOM_ENCODER, None, None, "text",
                        args.batch_size, key=kk,
                    )
            else:  # text modality from live game state, tiled across steps
                descs = env.describe(state.vec_state)
                descriptions = descs * args.num_steps  # index t·N+n → env n
                clip_embeddings = encode_tokens(jnp.asarray(tokenize(descriptions)))
            state, scalars = trainer.run_update_half(
                state, flat, iteration, clip_embeddings
            )
            logger.handle(iteration, *trainer.fetch_logs(scalars, episode_stats))
        else:
            # Fused paths: K iterations per device dispatch, chunk ends
            # aligned to checkpoint boundaries, each chunk's packed log
            # fetch overlapped with the next chunk's compute (LogPipeline).
            k = chunk_length(
                args.iterations_per_dispatch, iteration, args.num_iterations,
                (iteration - 1) * args.batch_size, args.batch_size,
                args.save_freq, args.save_model,
            )
            state, packed = trainer.run_iterations(state, iteration, k)
            pipeline.after_dispatch(iteration, packed)

        iteration += k
        if (args.save_model and is_main
                and ((iteration - 1) * args.batch_size) % args.save_freq == 0):
            pipeline.flush()
            save_checkpoint(
                checkpoint_path, state.params, state.opt_state,
                iteration - 1, logger.global_step, args,
                b_returns=logger.b_returns,
            )
    pipeline.flush()

    if args.save_model and is_main:
        save_checkpoint(
            checkpoint_path, state.params, state.opt_state,
            args.num_iterations, logger.global_step, args,
            b_returns=logger.b_returns,
            final=True,
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


def _train_ale(
    args: Args,
    cfg: PPOConfig,
    run_name: str,
    writer,
    recorder,
    profiler,
    *,
    compute_clip: bool,
    clip_params,
    clip_cfg,
    frozen_params,
    features_fn,
    embed_images_fn,
    disturbance,
    needs_projection: bool,
) -> dict:
    """Host-emulator backend: the reference's flagship loop over the real
    ALE wrapper stack (`clip_ppo_atari.py:465-789`) with per-frame
    disturbances applied on device, RAM-based text descriptions from live
    emulator state, CLIP alignment with the exact gradient topology, and
    temporal-projection checkpointing."""
    from clip_ppo_tpu.envs.atari.ale_adapter import ALEVectorEnv
    from clip_ppo_tpu.train import HostTrainer

    cc = args.clip_config
    # Env groups pipeline host emulator stepping against device policy
    # compute (HostTrainer docstring); group sizes split num_envs as
    # evenly as possible, capture/describe order = flattened group order.
    n_groups = max(1, min(args.rollout_groups, args.num_envs))
    sizes = [
        args.num_envs // n_groups + (1 if g < args.num_envs % n_groups else 0)
        for g in range(n_groups)
    ]
    env_groups = [
        ALEVectorEnv(args.env_id, n, run_name=run_name) for n in sizes
    ]
    env = env_groups[0]
    frame_fn = env.frame_env0 if (args.capture_video and recorder is not None) else None
    trainer = HostTrainer(
        cfg, env_groups, num_iterations=args.num_iterations,
        features_fn=features_fn, frozen_params=frozen_params,
        disturbance=disturbance, disturbance_semantics="stack_frames",
        embed_images_fn=embed_images_fn, clip_lambda=cc.clip_lambda,
        frame_fn=frame_fn,
    )
    params = init_agent_params(
        jax.random.PRNGKey(args.seed), env.num_actions,
        in_channels=4, with_temporal_projection=needs_projection,
    )
    state = trainer.init_state(params, args.seed)

    encode_tokens = None
    if compute_clip and cc.clip_modality == "text" \
            and cc.ablation_mode != AblationMode.RANDOM_ENCODER:
        _encode = jax.jit(
            lambda cp, toks: clip_utils.l2_normalize(
                clip_model_mod.encode_text(cp, clip_cfg, toks)
            )
        )
        encode_tokens = lambda toks: _encode(clip_params, toks)

    checkpoint_path = None
    if args.save_model:
        os.makedirs(args.model_path, exist_ok=True)
        checkpoint_path = os.path.join(args.model_path, run_name)

    start_iteration = 1
    global_step = 0
    if args.resume_checkpoint:
        params, opt_state, it, global_step, _ = load_checkpoint(
            args.resume_checkpoint, state.params, state.opt_state
        )
        state = dataclasses.replace(state, params=params, opt_state=opt_state)
        start_iteration = it + 1

    rand_key = jax.random.PRNGKey(args.seed + 1)
    logger = IterationLogger(
        writer, profiler, recorder, num_envs=args.num_envs,
        batch_size=args.batch_size, num_iterations=args.num_iterations,
        log_clip_loss=True,
        verbose_fn=(
            (lambda it, scalars: clip_utils.verbose_debug_print(
                it, cc.clip_lambda, args.ent_coef, args.vf_coef, scalars))
            if compute_clip and args.verbose else None
        ),
    )
    logger.global_step = global_step  # 0 or the resumed checkpoint's
    for iteration in range(start_iteration, args.num_iterations + 1):
        state, batch, episodes, extras = trainer.run_rollout(state)

        # Pre-compute CLIP embeddings once per iteration from the CURRENT
        # game state, tiled across steps like the reference's
        # ``i % num_envs`` cycling (`clip_ppo_atari.py:642-670`). The
        # image modality encodes inside the jitted update instead.
        clip_embeddings = None
        if compute_clip and embed_images_fn is None:
            if cc.ablation_mode == AblationMode.RANDOM_ENCODER:
                rand_key, kk = jax.random.split(rand_key)
                if cc.clip_modality == "image":
                    emb = clip_utils.generate_clip_embeddings(
                        AblationMode.RANDOM_ENCODER, None, None, "image",
                        args.batch_size * 4, key=kk,
                    )
                    clip_embeddings = emb.reshape(args.batch_size, -1)
                else:
                    clip_embeddings = clip_utils.generate_clip_embeddings(
                        AblationMode.RANDOM_ENCODER, None, None, "text",
                        args.batch_size, key=kk,
                    )
            else:
                descs = [d for e in env_groups for d in e.describe()]
                descriptions = descs * args.num_steps  # index t·N+n → env n
                clip_embeddings = encode_tokens(jnp.asarray(tokenize(descriptions)))

        state, scalars = trainer.run_update(state, batch, iteration, clip_embeddings)

        logger.log_host_iteration(iteration, scalars, episodes, extras)

        if args.save_model and logger.global_step % args.save_freq == 0:
            save_checkpoint(
                checkpoint_path, state.params, state.opt_state,
                iteration, logger.global_step, args,
                b_returns=np.asarray(trainer.last_b_returns),
            )

    if args.save_model:
        save_checkpoint(
            checkpoint_path, state.params, state.opt_state,
            args.num_iterations, logger.global_step, args,
            b_returns=(
                np.asarray(trainer.last_b_returns)
                if trainer.last_b_returns is not None else None
            ),
            final=True,
        )
    for e in env_groups:
        e.close()
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
