"""Count-based exploration bonus (SimHash buckets) — beyond-reference.

The reference trains vanilla/CLIP PPO only; its sparse-reward MiniGrid
families that need deep exploration (LockedRoom, ObstructedMaze-*) are
honest negatives under it (docs/PERFORMANCE.md, measured). This module
adds the classic static-hashing count bonus of Tang et al. 2017
("#Exploration: A Study of Count-Based Exploration for Deep RL"):
observations are projected through a fixed random matrix, the sign
pattern is a bucket index, and each visit to a bucket pays an intrinsic
reward ``beta / sqrt(N(bucket))`` on top of the env reward before GAE.

TPU shape: everything is one batched program per iteration — a single
[T·N, D] x [D, bits] matmul to hash the whole rollout, one scatter-add
into the persistent count table (a TrainState leaf, donated like the
rest), one gather for the rewards. No per-step work is added to the
rollout scan and no host round trips are introduced.

Within-iteration novelty uses the POST-rollout counts (the whole
rollout's visits are applied before the bonus is read), so a bucket
first seen this iteration pays ``beta / sqrt(k)`` on its k-th visit
rather than ``beta / sqrt(previous_total)`` — conservative, and it keeps
the update a single scatter instead of a sequential count replay.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_projection(key: jax.Array, obs_dim: int, bits: int) -> jax.Array:
    """Fixed Gaussian projection [D, bits] (drawn once per run; SimHash's
    ``A`` matrix). Tiny — safe to close over in the jitted iteration."""
    return jax.random.normal(key, (obs_dim, bits), jnp.float32)


def init_counts(bits: int) -> jax.Array:
    """Persistent visit-count table, one int32 cell per sign bucket."""
    return jnp.zeros((1 << bits,), jnp.int32)


def hash_obs(proj: jax.Array, obs: jax.Array) -> jax.Array:
    """Bucket indices for a [..., *obs_shape] batch of observations.

    Observations are flattened and centered by their OWN mean: uint8
    codes sit entirely in the positive orthant, so any fixed offset
    leaves a common component ~40× larger than the per-cell differences
    and every projection's sign is decided by it alone (measured: 64
    random views → 1 bucket). Per-sample centering removes exactly that
    component, deterministically and batch-independently; then
    ``sign(x @ A)`` is packed little-endian into an int32 index."""
    flat = obs.reshape(obs.shape[: obs.ndim - 3] + (-1,)).astype(jnp.float32)
    flat = flat - jnp.mean(flat, axis=-1, keepdims=True)
    bits = (flat @ proj) > 0
    weights = (1 << jnp.arange(proj.shape[1], dtype=jnp.int32))
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def count_bonus(
    counts: jax.Array, idx: jax.Array, beta: float
) -> tuple[jax.Array, jax.Array]:
    """Apply one rollout's visits and read the bonus.

    ``idx`` is any-shaped int32 bucket indices; returns
    (updated counts, intrinsic rewards of ``idx``'s shape)."""
    new_counts = counts.at[idx.reshape(-1)].add(1)
    visits = new_counts[idx].astype(jnp.float32)
    return new_counts, jnp.float32(beta) * jax.lax.rsqrt(visits)


# -- episodic novelty (NGU-style first-visit, r5) ---------------------------
#
# The global table above dilutes across per-episode-RANDOMIZED layouts
# (KeyCorridorS6R3, MultiRoom-N6: every episode's buckets differ, so
# counts grow everywhere and the bonus washes out — docs/PERFORMANCE.md)
# and goes quiet once blocked-door composites exhaust their early
# novelty. The episodic term pays for first visits WITHIN the current
# episode (Never-Give-Up's episodic memory, simplified to a first-visit
# indicator over the same SimHash buckets), so systematic within-episode
# coverage stays rewarded forever and layout randomization cannot dilute
# it. Composable with the global bonus:
#     r_int = beta_g / sqrt(N_global(b))  +  beta_e * 1[first visit of b
#                                              this episode]
#
# TPU shape: the per-env episodic memory is a bitset [N, 2^bits / 32]
# (uint32 words; bits=18 -> 32 KiB per env) carried in TrainState and
# dp-sharded WITH the envs (unlike the global table, which is
# replicated). The rollout's visits replay as a [T]-step lax.scan over
# the bitset — two gathers + two scatters per step on [N]-vectors, no
# host traffic; the memory clears at the episode boundaries the batch
# already records.


def init_episodic_mem(num_envs: int, bits: int) -> jax.Array:
    """Per-env first-visit bitset, cleared at episode boundaries."""
    return jnp.zeros((num_envs, (1 << bits) >> 5), jnp.uint32)


def episodic_bonus(
    mem: jax.Array, idx: jax.Array, dones: jax.Array, beta: float
) -> tuple[jax.Array, jax.Array]:
    """First-visit bonus over one rollout.

    ``idx`` [T, N] bucket indices; ``dones`` [T, N] — the done flag
    ENTERING each step (RolloutBatch.dones), i.e. step t starts a fresh
    episode for env n when dones[t, n] == 1, so the memory row clears
    BEFORE step t's visit is tested. Returns (mem after the rollout,
    [T, N] intrinsic rewards)."""
    n = idx.shape[1]
    rows = jnp.arange(n)

    def step(mem, td):
        idx_t, done_t = td
        mem = jnp.where(done_t[:, None] > 0, jnp.uint32(0), mem)
        word, bit = idx_t >> 5, (idx_t & 31).astype(jnp.uint32)
        seen = (mem[rows, word] >> bit) & 1
        bonus = jnp.float32(beta) * (1.0 - seen.astype(jnp.float32))
        mem = mem.at[rows, word].set(mem[rows, word] | (jnp.uint32(1) << bit))
        return mem, bonus

    mem, bonuses = jax.lax.scan(step, mem, (idx, dones))
    return mem, bonuses
