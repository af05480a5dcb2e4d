"""Worker process for the two-process DCN smoke tests.

Usage: python tests/helpers/dcn_worker.py <process_id> <coordinator_port> [mode]

Exercises the real multi-host bring-up path (SURVEY §2c comm backend):
`parallel.distributed.initialize_distributed` (jax.distributed.initialize
over localhost) and `global_mesh()` spanning both processes' devices.

mode "update" (default): one data-parallel PPO update through the
framework's own `ppo.update_epochs(axis_name="dp")` under shard_map —
gradients pmean'd across the process boundary.

mode "trainer": the full user-facing path — `Trainer(mesh=global_mesh())`
with device-resident envs, `init_state` → `run_iterations` (a 3-iteration
chunk: rollout scan + GAE + minibatch updates, all SPMD across the two
processes) → `fetch_logs_chunk` (cross-process log allgather).

Both modes print a digest of the updated parameters; the parent asserts
both processes print the same digest (replicated updates) and that it
differs from the initial parameters (training happened).
"""

import hashlib
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax

# The axon sitecustomize in this image overrides JAX_PLATFORMS after
# env-var parsing; force the CPU backend before any backend use.
jax.config.update("jax_platforms", "cpu")


def _digest(tree) -> str:
    import numpy as np

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(tree):
        local = np.asarray(
            leaf.addressable_shards[0].data if isinstance(leaf, jax.Array)
            and not leaf.is_fully_addressable else leaf
        )
        assert np.all(np.isfinite(local))
        h.update(local.tobytes())
    return h.hexdigest()


def main_trainer(mesh) -> None:
    """Full user-facing Trainer across the two-process mesh."""
    import numpy as np
    import jax.numpy as jnp  # noqa: F401  (keeps parity with main())

    from clip_ppo_tpu.envs import JaxVectorEnv
    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import PPOConfig, Trainer

    env = JaxVectorEnv("MiniGrid-Empty-5x5-v0", 4)
    cfg = PPOConfig(num_envs=4, num_steps=8, num_minibatches=2,
                    update_epochs=1)
    trainer = Trainer(cfg, env, num_iterations=4, mesh=mesh)
    params = init_agent_params(jax.random.PRNGKey(0), env.num_actions)
    init_dg = _digest(jax.tree_util.tree_map(np.asarray, params))
    state = trainer.init_state(params, seed=0)

    state, packed = trainer.run_iterations(state, 1, 3)
    logs = trainer.fetch_logs_chunk(packed)
    assert len(logs) == 3
    pg = float(logs[-1][0]["policy_loss"])
    assert np.isfinite(pg)
    assert logs[-1][1]["b_returns"].shape == (cfg.batch_size,)

    print(f"DIGEST {_digest(state.params)} INIT {init_dg} PG {pg:.6f}",
          flush=True)
    jax.distributed.shutdown()


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "update"
    nprocs = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from clip_ppo_tpu.parallel.distributed import (
        global_mesh,
        initialize_distributed,
    )

    assert initialize_distributed(f"127.0.0.1:{port}", nprocs, proc_id)
    assert jax.process_count() == nprocs, jax.process_count()
    mesh = global_mesh()
    assert mesh.shape["dp"] == nprocs and mesh.shape["tp"] == 1, dict(mesh.shape)

    if mode == "trainer":
        main_trainer(mesh)
        return

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clip_ppo_tpu.models import init_agent_params
    from clip_ppo_tpu.train import ppo as ppo_mod

    # Local (per-process) sizes; the global batch is 2× this.
    cfg = ppo_mod.PPOConfig(num_envs=2, num_steps=4, num_minibatches=2,
                            update_epochs=1)
    params = init_agent_params(jax.random.PRNGKey(0), 7, in_channels=3)
    optimizer = ppo_mod.make_optimizer(cfg)
    opt_state = optimizer.init(params)

    # Identical synthetic global batch on every process, laid out onto the
    # global mesh shard-by-shard (each process materializes only its block).
    rng = np.random.default_rng(0)
    gb = nprocs * cfg.batch_size
    full = {
        "obs": rng.integers(0, 255, (gb, 84, 84, 3), dtype=np.uint8),
        "actions": rng.integers(0, 7, (gb,), dtype=np.int32),
        "logprobs": rng.normal(-1.9, 0.1, (gb,)).astype(np.float32),
        "advantages": rng.normal(0, 1, (gb,)).astype(np.float32),
        "returns": rng.normal(0, 1, (gb,)).astype(np.float32),
        "values": rng.normal(0, 1, (gb,)).astype(np.float32),
    }
    sharded = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())

    def to_global(arr, sharding):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: np.asarray(arr)[idx]
        )

    flat_g = {k: to_global(v, sharded) for k, v in full.items()}
    params_g = jax.tree_util.tree_map(
        lambda x: to_global(np.asarray(x), replicated), params
    )
    opt_g = jax.tree_util.tree_map(
        lambda x: to_global(np.asarray(x), replicated), opt_state
    )
    key_g = to_global(np.asarray(jax.random.PRNGKey(42)), replicated)

    def body(params, opt_state, flat, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        return ppo_mod.update_epochs(
            params, opt_state, flat, key, cfg, optimizer, axis_name="dp"
        )

    new_params, _, metrics = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P("dp"), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )(params_g, opt_g, flat_g, key_g)

    def digest(tree) -> str:
        h = hashlib.sha256()
        for leaf in jax.tree_util.tree_leaves(tree):
            local = np.asarray(leaf.addressable_shards[0].data)
            assert np.all(np.isfinite(local))
            h.update(local.tobytes())
        return h.hexdigest()

    pg = float(np.asarray(
        jax.tree_util.tree_leaves(metrics.pg_loss)[0].addressable_shards[0].data
    ))
    print(f"DIGEST {digest(new_params)} INIT {digest(params_g)} PG {pg:.6f}",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
