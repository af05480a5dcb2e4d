"""Measure the host/ALE rollout pipeline on the real device (VERDICT r2
item 3): the reference pays one serial jitted-policy dispatch plus a full
tensor fetch per env step (`/root/reference/atari_experiments/ppo/
ppo_atari.py:248-255`); the r3 HostTrainer writes policy outputs into
donated device-resident buffers (one small action fetch per step) and
software-pipelines host env stepping against in-flight device compute
via env groups.

Three rollout schedules over the same FakeALE Breakout stack, same
shapes (8 envs x 128 steps, the reference Atari defaults):

  reference  per-step dispatch + fetch of action/logprob/value to host
             (the r2/reference boundary, emulated inline)
  serial     HostTrainer overlap=False, 1 group (device buffers, but no
             host/device overlap)
  pipelined  HostTrainer overlap=True, 2 rollout groups by default (the
             ale backend's CLI default, clip_ppo_atari.Args.rollout_groups;
             --groups N for deeper-pipeline comparisons)

Timing is plain wall clock: every schedule synchronizes each step by
fetching at least the action array, so there is no dispatch-rate trap
(CLAUDE.md) — the fetch IS the cost being measured.

Usage: python benchmarks/host_ale_pipeline.py [--steps 128] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")  # run from the repo root (CLAUDE.md)

import numpy as np

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs.atari import fake_ale
from clip_ppo_tpu.envs.atari.ale_adapter import ALEVectorEnv
from clip_ppo_tpu.models import agent as agent_mod
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.train import HostTrainer, PPOConfig

NUM_ENVS = 8
ENV_DELAY_S = 0.0  # per-group per-step host cost (set via --env-delay-ms)


class _DelayedEnv:
    """Wrap a vector env with a fixed per-step host cost, emulating the
    real ALE's C++ emulation time (~1-2 ms/env/step at frameskip 4 —
    the bundled FakeALE steps in ~10 µs, so overlap has nothing to hide
    on a zero-cost env; see docs/PERFORMANCE.md host-path analysis)."""

    def __init__(self, env, delay_s: float):
        self._env = env
        self._delay_s = delay_s

    def step(self, action):
        time.sleep(self._delay_s)
        return self._env.step(action)

    def __getattr__(self, name):
        return getattr(self._env, name)


def make_groups(n_groups: int, num_envs: int = NUM_ENVS):
    sizes = [
        num_envs // n_groups + (1 if g < num_envs % n_groups else 0)
        for g in range(n_groups)
    ]
    envs = [ALEVectorEnv(fake_ale.FAKE_ENV_ID, n) for n in sizes]
    if ENV_DELAY_S > 0.0:
        envs = [_DelayedEnv(e, ENV_DELAY_S * n / num_envs)
                for e, n in zip(envs, sizes)]
    return envs


def bench_reference_boundary(params, cfg, iters: int) -> float:
    """The reference/r2 schedule: one jitted dispatch per env step with
    action, logprob and value all fetched to the host before the env may
    step (`ppo_atari.py:248-255`)."""
    (env,) = make_groups(1)
    obs, _ = env.reset(seed=0)
    obs = np.asarray(obs)

    @jax.jit
    def policy(params, obs, key):
        a, lp, _, v = agent_mod.get_action_and_value(
            params, jnp.asarray(obs), key, agent_mod.cnn_features, None
        )
        return a, lp, v

    key = jax.random.PRNGKey(0)

    def rollout():
        nonlocal obs, key
        for t in range(cfg.num_steps):
            key, k = jax.random.split(key)
            a, lp, v = policy(params, obs, k)
            # the reference boundary: everything crosses to host, serially
            a = np.asarray(a)
            _, _ = np.asarray(lp), np.asarray(v)
            obs = np.asarray(env.step(a)[0])

    rollout()  # compile + steady state
    t0 = time.perf_counter()
    for _ in range(iters):
        rollout()
    return iters * cfg.num_steps * NUM_ENVS / (time.perf_counter() - t0)


def bench_host_trainer(params, cfg, iters: int, n_groups: int,
                       overlap: bool) -> float:
    tr = HostTrainer(cfg, make_groups(n_groups), num_iterations=iters + 2,
                     overlap=overlap)
    st = tr.init_state(params, seed=0)
    st, _, _, _ = tr.run_rollout(st)  # compile + steady state
    t0 = time.perf_counter()
    for _ in range(iters):
        st, _, _, _ = tr.run_rollout(st)
    return iters * cfg.num_steps * NUM_ENVS / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--env-delay-ms", type=float, default=0.0,
                    help="total host env cost per 8-env step, emulating "
                         "the real ALE (FakeALE itself is ~free)")
    args = ap.parse_args()
    global ENV_DELAY_S
    ENV_DELAY_S = args.env_delay_ms / 1000.0

    fake_ale.register()
    cfg = PPOConfig(num_envs=NUM_ENVS, num_steps=args.steps,
                    num_minibatches=4, update_epochs=4)
    params = init_agent_params(jax.random.PRNGKey(0), 4, in_channels=4)

    print(f"device: {jax.devices()[0].platform}", flush=True)
    ref = bench_reference_boundary(params, cfg, args.iters)
    print(f"reference boundary: {ref:,.0f} env-steps/s", flush=True)
    ser = bench_host_trainer(params, cfg, args.iters, 1, overlap=False)
    print(f"serial (device buffers): {ser:,.0f} env-steps/s", flush=True)
    pipe = bench_host_trainer(params, cfg, args.iters, args.groups,
                              overlap=True)
    print(f"pipelined ({args.groups} groups): {pipe:,.0f} env-steps/s",
          flush=True)
    print(json.dumps({
        "reference_boundary_sps": round(ref, 1),
        "serial_sps": round(ser, 1),
        "pipelined_sps": round(pipe, 1),
        "speedup_vs_reference": round(pipe / ref, 2),
        "speedup_vs_serial": round(pipe / ser, 2),
    }))


if __name__ == "__main__":
    main()
