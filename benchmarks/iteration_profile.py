"""Decompose the bench-config iteration (8 envs × 128 steps, Empty-16x16)
into rollout vs update device time on the real TPU (single tunnel client).

The driver metric (`bench.py`) is latency-bound at 8 envs: the same
program saturates at ~144k SPS with ≥64 envs, so the 8-env wall-clock is
dominated by per-kernel launch latency inside the 128-step rollout scan
plus the 16-minibatch update. This driver measures where the ~14.6 ms
iteration actually goes, with the chained-dependency methodology from
bench.py (dispatch n chained repetitions, fetch ONE dependent scalar,
subtract a null round trip).

Usage: python benchmarks/iteration_profile.py [num_envs ...]
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.train import PPOConfig, Trainer


def timed(label, jfn, *args, n):
    out = jfn(*args)
    _ = jax.tree_util.tree_leaves(out)[0].ravel()[0].item()  # warm + sync
    null = jax.jit(lambda x: x.ravel()[0])
    x0 = jnp.zeros(8)
    _ = float(null(x0))
    t0 = time.perf_counter()
    _ = float(null(x0))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jfn(*args)
    _ = jax.tree_util.tree_leaves(out)[0].ravel()[0].item()
    per = (time.perf_counter() - t0 - rtt) / n
    print(f"{label}: {per * 1e3:.2f} ms ({n} reps, rtt {rtt * 1e3:.0f} ms)",
          flush=True)
    return per


def main(num_envs: int, n: int = 50) -> None:
    env = JaxVectorEnv("MiniGrid-Empty-16x16-v0", num_envs)
    cfg = PPOConfig(num_envs=num_envs, num_steps=128)
    tr = Trainer(cfg, env, num_iterations=1000)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    state = tr.init_state(params, seed=0)
    print(f"--- num_envs={num_envs} ---", flush=True)

    # (a) full iteration ×n (the bench.py program, minus log packing)
    def full(state):
        def body(st, it):
            st, _scalars, _stats = tr._iteration(st, it, None)
            return st, ()
        state, _ = jax.lax.scan(
            body, state, jnp.arange(1, n + 1, dtype=jnp.int32))
        return state.params["critic"]["w"]
    timed("full iteration ", jax.jit(full), state, n=n)

    # (b) rollout + GAE only ×n
    def roll(state):
        def body(st, _):
            st, batch = tr._rollout(st, None)
            data = tr._data2d(st, batch, None)
            # fold a scalar back so scan can't dead-code the GAE
            st = dataclasses.replace(
                st, next_done=st.next_done + 0.0 * data["advantages"].sum())
            return st, ()
        state, _ = jax.lax.scan(body, state, None, length=n)
        return state.next_done
    timed("rollout + GAE  ", jax.jit(roll), state, n=n)

    # (c) update only ×n (fixed rollout data, fresh key each rep)
    st1, batch = jax.jit(lambda s: tr._rollout(s, None))(state)
    data = jax.jit(lambda s, b: tr._data2d(s, b, None))(st1, batch)

    def upd(state, data):
        def body(st, it):
            st, _sc = tr._update(st, data, it, None, None)
            return st, ()
        state, _ = jax.lax.scan(
            body, state, jnp.arange(1, n + 1, dtype=jnp.int32))
        return state.params["critic"]["w"]
    timed("update (4ep×4mb)", jax.jit(upd), st1, data, n=n)

    # (d) env stepping alone: 128·n random-action steps, no agent forward
    def envonly(state):
        def body(carry, _):
            vec_state, key = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.randint(
                k_act, (num_envs,), 0, env.num_actions)
            vec_state, _obs, _r, _t, _tr, _info = env._step_impl(
                vec_state, actions)
            return (vec_state, key), ()
        carry, _ = jax.lax.scan(
            body, (state.vec_state, state.key), None, length=128 * n)
        return carry[0].episode_return
    timed("env.step+obs ×128", jax.jit(envonly), state, n=n)


if __name__ == "__main__":
    for ne in [int(a) for a in sys.argv[1:]] or [8]:
        main(ne)
