"""clip_ppo_tpu — a TPU-native (JAX/XLA/Pallas) framework for PPO and
CLIP-regularized PPO visual-robustness research.

Re-designed from scratch for TPU with the capabilities of the reference
CLIP-PPO codebase (see SURVEY.md): pure-JAX vectorized environments
(MiniGrid, Atari-family) so rollout + GAE + the PPO/CLIP update compile
into a single jitted program per iteration; a JAX CLIP (ViT-B/32,
ViT-L/14) image/text encoder; a fused on-device visual-disturbance
pipeline; and pjit/shard_map data-parallel scaling over a device mesh.
"""

__version__ = "0.1.0"
