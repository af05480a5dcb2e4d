"""CLIP-PPO on MiniGrid — flag-compatible with the reference
`minigrid_experiments/clip_ppo/clip_ppo_minigrid.py`, rebuilt TPU-native.

Differences in *mechanism* (never in semantics) vs the reference:

* rollout + GAE + the 4×4 minibatch update (including the CLIP cosine
  term, gated to every 4th minibatch with λ warmup) compile into XLA
  programs; the image modality is fully fused, and the text modality is
  too by default — descriptions are f(agent_pos, dir) + a constant
  border-wall suffix, so the W·H·4 description-embedding table is
  precomputed once and gathered in-graph (``--no-text-embed-table``
  restores the reference-shaped split: two jitted halves around host
  symbolic-description/tokenization, SURVEY §7 hard part 6);
* GPU-batch disturbances (`DisturbanceWrapperGPU` semantics: shared cutout
  patch per batch, blend-with-gray contrast) run on-device inside the
  rollout, applied to the observation BEFORE storing/acting
  (`clip_ppo_minigrid.py:381-388`);
* the CLIP text encoder consumes the whole iteration's 1024 descriptions
  in one batched pass, matching the reference's per-iteration precompute
  (`clip_ppo_minigrid.py:460-485`);
* gradient topology is identical: latents are stop-gradient'd, so on
  MiniGrid the CLIP loss is a monitor that never perturbs the policy
  gradient (`clip_ppo_minigrid.py:269-271,533-559`).

TensorBoard tags (including the machine-read ``config/disturbance_severity``
text tag), checkpoint payload/naming, derived batch sizes, and the CLI
surface (``--clip-config.*``) match the reference exactly.
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
from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.envs.minigrid import core as minigrid_core
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
class MiniGridClipPPOConfig(clip_utils.ClipPPOConfig):
    """MiniGrid-specific CLIP-PPO defaults (`clip_ppo_minigrid.py:35-55`)."""

    clip_lambda: float = 0.0
    """coefficient for CLIP alignment loss - good default for MiniGrid"""
    clip_model: str = "ViT-B/32"
    """CLIP model variant - standard choice"""
    clip_modality: str = "text"
    """MiniGrid works well with symbolic text descriptions"""
    ablation_mode: AblationMode = AblationMode.NONE
    """Default ablation mode for MiniGrid experiments"""
    apply_disturbances: bool = False
    """start with clean environment by default"""
    disturbance_severity: str = "MODERATE"
    """moderate disturbances work well for MiniGrid"""
    structured_frozen_init: bool = False
    """no reference equivalent: when no pretrained checkpoint exists,
    distill the CLIP visual tower on device to pixel-PCA features of
    random-policy observations before training. With FROZEN_CLIP this
    makes the frozen trunk's features learnable by the actor/critic
    heads; with an active image-modality CLIP loss it makes the
    alignment target non-degenerate (a random-init ViT's embeddings
    barely separate states; see models/distill.py)"""


@dataclass
class Args:
    exp_name: str = "clip_ppo_minigrid"
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
    env_id: str = "MiniGrid-Empty-16x16-v0"
    """the id of the environment"""
    total_timesteps: int = 100_000
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
    clip_config: MiniGridClipPPOConfig = field(default_factory=MiniGridClipPPOConfig)
    """MiniGrid-specific CLIP-PPO configuration"""

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

    # Mission conditioning (no reference equivalent — the reference drops
    # the mission via ImgObsWrapper, `clip_ppo_minigrid.py:142-155`;
    # models/mission.py). Composes with the text modality; the image
    # modality's embed path consumes raw image batches and is rejected.
    mission_conditioning: bool = False
    """FiLM-condition the policy/value trunk on the env's structured
    instruction (EnvState.target/instr)"""

    # TPU execution arguments (no reference equivalent — single-device there)
    num_devices: int = 1
    """data-parallel device count (0 = all available); envs and the PPO
    batch are sharded across a dp mesh, parameters replicated"""
    tp: int = 1
    """tensor-parallel degree for the per-iteration CLIP image encode
    (SURVEY §2c: the ViT-L/14 eval-sweep load, `clip_ppo_utils.py:211-215`):
    the tower weights shard Megatron-style over a tp mesh axis
    (parallel/tp.py), attention runs on the GSPMD-partitionable einsum
    path, the batch rides dp = num_devices/tp. Image modality only"""
    distributed: bool = False
    """multi-host data-parallel training: bring up jax.distributed
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or TPU
    pod auto-detection) and span the dp mesh over every host's devices;
    only process 0 writes TB/videos/checkpoints"""
    iterations_per_dispatch: int = 8
    """training iterations fused into one device dispatch (fused paths
    only; the split text path runs per-iteration around host tokenization)"""
    text_embed_table: bool = True
    """text modality: precompute the W·H·4 description-embedding table at
    startup and gather in-graph (fully fused iteration, chunked dispatch;
    embeddings identical to per-step host tokenization). Disable to force
    the reference-shaped split path."""

    # to be filled in runtime
    batch_size: int = 0
    """the batch size (computed in runtime)"""
    minibatch_size: int = 0
    """the mini-batch size (computed in runtime)"""
    num_iterations: int = 0
    """the number of iterations (computed in runtime)"""


def train(args: Args, run_name: Optional[str] = None) -> dict:
    """Run CLIP-PPO training; returns summary stats (for tests/benchmarks)."""
    args.batch_size = int(args.num_envs * args.num_steps)
    args.minibatch_size = int(args.batch_size // args.num_minibatches)
    args.num_iterations = args.total_timesteps // args.batch_size
    cc = args.clip_config
    run_name = (
        run_name
        or args.run_name
        or f"{args.env_id}__{args.exp_name}__{args.seed}__{int(time.time())}"
    )

    # Mesh first: jax.distributed must initialize before any computation.
    mesh, is_main = setup_mesh(args.distributed, args.num_devices, args.tp)
    if mesh is not None and is_main:
        if args.tp > 1:
            print(f"Mesh dp={mesh.shape['dp']} x tp={mesh.shape['tp']}: "
                  f"envs on dp, CLIP tower tensor-sharded on tp")
        else:
            print(f"Data-parallel over {mesh.shape['dp']} devices "
                  f"({args.num_envs} envs sharded)")

    if is_main:
        maybe_init_wandb(args, run_name)
    writer = SummaryWriter(f"runs/{run_name}") if is_main else NullWriter()
    recorder = (
        VideoRecorder(f"videos/minigrid/clip_ppo/{run_name}")
        if args.capture_video and is_main else None
    )
    profiler = ProfilerWindow(args.profile_dir)
    writer.add_text("hyperparameters", hyperparameters_table(dataclasses.asdict(args)))
    # Machine-read severity tag (`clip_ppo_minigrid.py:301-304`,
    # consumed by metrics/calculate_metrics.py:57-87).
    writer.add_text(
        "config/disturbance_severity",
        cc.disturbance_severity if cc.apply_disturbances else "CLEAN",
    )

    random.seed(args.seed)
    np.random.seed(args.seed)

    env = JaxVectorEnv(args.env_id, args.num_envs)

    # CLIP tower is needed when the alignment loss is active or the trunk
    # is frozen CLIP (`clip_ppo_minigrid.py:321-326`).
    compute_clip = clip_utils.should_compute_clip_loss(cc.ablation_mode, cc.clip_lambda)
    clip_params, clip_cfg = (None, None)
    if compute_clip or cc.ablation_mode == AblationMode.FROZEN_CLIP:
        clip_params, clip_cfg = clip_utils.load_clip_model(cc.clip_model)

    if clip_params is not None and cc.structured_frozen_init:
        from clip_ppo_tpu.models import distill

        print("Distilling CLIP visual tower to pixel-PCA features...")
        obs_samples = distill.collect_random_observations(
            env, jax.random.PRNGKey(args.seed + 2),
            num_steps=max(256 // args.num_envs, 8),
        )
        clip_params = distill.distill_visual_tower(
            jax.random.PRNGKey(args.seed + 3), clip_params, clip_cfg,
            obs_samples,
        )

    # Frozen CLIP weights are threaded through TrainState.frozen as
    # {"clip": ...}; the feature/embedding fns never close over them.
    frozen_params = {"clip": clip_params} if clip_params is not None else None
    if cc.ablation_mode == AblationMode.FROZEN_CLIP:
        features_fn = clip_utils.make_frozen_clip_features_fn(clip_cfg)
    else:
        features_fn = cnn_features

    disturbance = None
    if cc.apply_disturbances:
        disturbance = resolve_params(DisturbanceSeverity[cc.disturbance_severity])
        print(f"Disturbances enabled with severity: {cc.disturbance_severity}")
    else:
        print("Disturbances disabled")

    # "precomputed": embeddings enter the update as data; stop-gradient
    # latents make the loss a monitor (`clip_ppo_minigrid.py:269-271`).
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
        clip_mode="precomputed" if compute_clip else "none",
    )

    fused_image_path = (
        compute_clip
        and cc.clip_modality == "image"
        and cc.ablation_mode != AblationMode.RANDOM_ENCODER
    )
    embed_images_fn = None
    if fused_image_path:
        if args.tp > 1:
            # tensor-parallel encode: weights sharded over the tp axis,
            # attention forced onto the GSPMD-partitionable einsum path
            # (the Pallas kernels have no partition rule).
            from clip_ppo_tpu.parallel.tp import shard_clip_params

            frozen_params["clip"] = shard_clip_params(mesh, clip_params)
            embed_images_fn = clip_utils.make_encode_images_fn(
                clip_cfg, attention_impl="xla")
        else:
            embed_images_fn = clip_utils.make_encode_images_fn(clip_cfg)
    elif args.tp > 1:
        raise SystemExit(
            "--tp shards the per-iteration CLIP image encode; it needs "
            "--clip-config.clip_modality image with an active CLIP loss "
            "(not FROZEN_CLIP/RANDOM_ENCODER/text)"
        )

    # Text modality: MiniGrid descriptions are exactly f(agent_x, agent_y,
    # dir) + a constant border-wall suffix, so the full W·H·4 description
    # space is encoded once and the per-step embedding becomes an in-graph
    # table gather — the text modality runs fully fused (chunked dispatch
    # included) with bit-identical embeddings to the per-step host path.
    fused_text_path = (
        compute_clip
        and cc.clip_modality == "text"
        and cc.ablation_mode != AblationMode.RANDOM_ENCODER
        and args.text_embed_table
    )
    embed_desc_fn = None
    if fused_text_path:
        w, h = env.params.width, env.params.height
        # the suffix (first 3 non-empty cells in x-major order) is the
        # static x=0 border wall on every bordered layout; verify on 16
        # sampled resets and fall back to the split path if it ever varied
        # (GoToDoor-8x8 puts its left-wall door at (0,2) in ~half of the
        # episodes, so a 2-sample check could pass by coincidence there).
        suffixes = {
            minigrid_core._objects_suffix(
                np.asarray(minigrid_core.reset(env.params, jax.random.PRNGKey(s)).grid)
            )
            for s in range(16)
        }
        if len(suffixes) == 1:
            table = clip_utils.build_minigrid_text_table(
                clip_params, clip_cfg, w, h, suffixes.pop()
            )
            frozen_params = dict(frozen_params or {}, text_table=table)
            embed_desc_fn = clip_utils.make_text_table_embed_fn(h)
        else:
            fused_text_path = False

    # RANDOM_ENCODER in-graph: fresh normalized Gaussians per iteration
    # from the carried PRNG chain (stream differs from the reference's
    # torch RNG, as any reimplementation's must).
    embed_random_fn = None
    if compute_clip and cc.ablation_mode == AblationMode.RANDOM_ENCODER:
        embed_random_fn = clip_utils.make_random_embed_fn(args.batch_size)


    trainer = Trainer(
        cfg,
        env,
        num_iterations=args.num_iterations,
        disturbance=disturbance,
        disturbance_semantics="batched",  # GPU-pipeline semantics
        features_fn=features_fn,
        embed_images_fn=embed_images_fn,
        embed_desc_fn=embed_desc_fn,
        embed_random_fn=embed_random_fn,
        clip_lambda=cc.clip_lambda,
        capture_env0=args.capture_video,
        frozen_params=frozen_params,
        mesh=mesh,
        mission_conditioning=args.mission_conditioning,
    )
    params = init_agent_params(
        jax.random.PRNGKey(args.seed), env.num_actions, in_channels=3,
        mission_dim=env.mission_dim if args.mission_conditioning else 0,
    )
    state = trainer.init_state(params, args.seed)

    # Batched text encode, jitted once per shape ([1024, 77] stays fixed).
    encode_tokens = None
    if compute_clip and cc.clip_modality == "text":
        # CLIP params passed as an argument (not a closure constant).
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
        compute_clip and not fused_image_path and not fused_text_path
        and embed_random_fn is None
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
            # split path runs one iteration per dispatch (synchronously —
            # the host is in the loop anyway).
            k = 1
            state, flat, episode_stats, desc_state = trainer.run_rollout_half(state)
            if cc.ablation_mode == AblationMode.RANDOM_ENCODER:
                rand_key, kk = jax.random.split(rand_key)
                clip_embeddings = clip_utils.generate_clip_embeddings(
                    AblationMode.RANDOM_ENCODER, None, None, cc.clip_modality,
                    args.batch_size, key=kk,
                )
            else:  # text modality: host descriptions + tokenization
                descriptions = minigrid_core.describe_rollout(
                    np.asarray(state.vec_state.env.grid),
                    np.asarray(desc_state["agent_pos"]),
                    np.asarray(desc_state["agent_dir"]),
                )
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


def main() -> None:
    train(flags.parse(Args))


if __name__ == "__main__":
    main()
