"""Dump the optimized HLO of the bench-config iteration program (TPU AOT
compile via the tunnel) and print an instruction census of the hot while
bodies — ground truth for which ops the 8-env latency-bound iteration
actually launches.

Usage: python benchmarks/hlo_dump.py [out.txt]
"""

import collections
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from clip_ppo_tpu.envs import JaxVectorEnv
from clip_ppo_tpu.models import init_agent_params
from clip_ppo_tpu.train import PPOConfig, Trainer


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/iteration_hlo.txt"
    env = JaxVectorEnv("MiniGrid-Empty-16x16-v0", 8)
    cfg = PPOConfig(num_envs=8, num_steps=128)
    tr = Trainer(cfg, env, num_iterations=1000)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    state = tr.init_state(params, seed=0)

    def chunk(state):
        state, packed = tr._chunk(state, jnp.int32(1), None, k=2)
        return state, packed

    compiled = jax.jit(chunk).lower(state).compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")

    # census: per while-body computation, count non-trivial instructions
    bodies = re.findall(r"%(\S*body\S*) \(([^)]*)\) -> .*?\{(.*?)\n\}",
                        txt, re.S)
    for name, _args, body in bodies:
        ops = collections.Counter()
        for line in body.splitlines():
            m = re.match(r"\s*(?:ROOT )?%?\S+ = \S+ (\w+)\(", line)
            if m and m.group(1) not in ("parameter", "constant", "tuple",
                                        "get-tuple-element", "bitcast"):
                ops[m.group(1)] += 1
        total = sum(ops.values())
        if total > 5:
            top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(12))
            print(f"{name}: {total} insts — {top}")


if __name__ == "__main__":
    main()
