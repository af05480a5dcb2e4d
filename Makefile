# clip-ppo-tpu developer targets (run from the repo root)

.PHONY: test test-fast bench bench-configs smoke dryrun clean-runs

test:            ## full suite, batched into isolated pytest processes
	python tests/run_suite.py

test-onepytest:  ## single-process suite (can segfault in XLA:CPU on this
	python -m pytest tests/ -q  ## box after ~100 compiles — see run_suite.py)

test-fast:       ## quick correctness slice
	python -m pytest tests/test_ppo.py tests/test_clip.py tests/test_flags.py \
	  tests/test_metrics.py tests/test_pallas_disturb.py -q

bench:           ## driver headline metric (runs on the real TPU)
	python bench.py

bench-configs:   ## the five BASELINE.md benchmark configs
	for c in 1 2 3 4 5; do python benchmarks/run_config.py --config $$c; done

smoke:           ## tiny end-to-end training run on CPU
	JAX_PLATFORMS=cpu python -m clip_ppo_tpu.cli.ppo_minigrid \
	  --env-id MiniGrid-Empty-5x5-v0 --total-timesteps 2048 \
	  --num-envs 2 --num-steps 32 --num-minibatches 2 --update-epochs 1 \
	  --no-capture-video --no-save-model

dryrun:          ## multi-chip sharding check on an 8-device CPU mesh
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean-runs:      ## remove local training artifacts
	rm -rf runs checkpoints videos plots disturbance_test.png
