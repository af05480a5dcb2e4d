"""Round-3 science run: PPO vs CLIP-PPO (image λ-sweep) vs FROZEN_CLIP
on MiniGrid-DoorKey-6x6 under HARD disturbances — the reference-design
multi-algorithm comparison (`/root/reference/metrics/compare_algorithms.py:41-100`,
grid shape per `/root/reference/run_experiments.py:82-208`) driven
end-to-end through the framework's own L4 + L5.

All runs execute sequentially **in one process** (one TPU client — the
tunneled device wedges under rapid client churn, see CLAUDE.md), via the
same ``train(args)`` entry the CLI uses. Runs are resumable: a run whose
TB directory already exists is skipped, so the driver can be re-launched
after an interruption.

Algorithms (× seeds 0/42, × {CLEAN, HARD}):
  PPO            — clip_ppo_minigrid with λ=0 (no CLIP tower at all)
  CLIP-PPO λ∈{1e-6,1e-5,1e-4} — image modality, distilled (pixel-PCA)
                   tower so the alignment target is non-degenerate
  FROZEN_CLIP    — distilled frozen ViT trunk (structured init)

Expected science outcome, stated up front: on MiniGrid the image-modality
CLIP term carries **no gradient** by reference design (stop-gradient
latents + precomputed embeddings, `clip_ppo_minigrid.py:269-271,460-485`),
so the λ-sweep is a *null* — curves should match PPO up to XLA scheduling
noise — while FROZEN_CLIP is a genuinely different algorithm (frozen
distilled features vs a learned CNN). The comparison dashboards must
resolve both: the null staying null, and the real difference showing.

Usage: python benchmarks/science_doorkey.py [--dry-run] [--skip-frozen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")  # run from the repo root (CLAUDE.md)

ENV_ID = "MiniGrid-DoorKey-6x6-v0"
TIMESTEPS = 1_500_000
SEEDS = (0, 42)
LAMBDAS = (1e-06, 1e-05, 1e-04)
SEVERITY = "HARD"
OUT_DIR = "docs/demo_plots/science_r3"
RESULTS_JSON = os.path.join(OUT_DIR, "runs.json")


def build_grid(skip_frozen: bool):
    """(run_name, algorithm, seed, lam, ablation, disturbed) tuples."""
    grid = []
    for seed in SEEDS:
        base = f"sci3_s{seed}_doorkey"
        grid.append((f"{base}_PPO_CLEAN", "PPO", seed, 0.0, "NONE", False))
        grid.append((f"{base}_PPO_HARD", "PPO", seed, 0.0, "NONE", True))
        for lam in LAMBDAS:
            tag = f"CLIPPPO_l{lam}"
            grid.append((f"{base}_{tag}_CLEAN", tag, seed, lam, "NONE", False))
            grid.append((f"{base}_{tag}_HARD", tag, seed, lam, "NONE", True))
        if not skip_frozen:
            grid.append((f"{base}_FROZENCLIP_CLEAN", "FROZEN_CLIP", seed,
                         0.0, "FROZEN_CLIP", False))
            grid.append((f"{base}_FROZENCLIP_HARD", "FROZEN_CLIP", seed,
                         0.0, "FROZEN_CLIP", True))
    return grid


def run_one(run_name, seed, lam, ablation, disturbed):
    from clip_ppo_tpu.cli import clip_ppo_minigrid as m
    from clip_ppo_tpu.models.agent import AblationMode

    cc = m.MiniGridClipPPOConfig(
        clip_lambda=lam,
        clip_modality="image",
        ablation_mode=AblationMode[ablation],
        apply_disturbances=disturbed,
        disturbance_severity=SEVERITY,
        # distill the tower whenever one exists, so image-modality
        # embeddings / frozen features are non-degenerate without
        # pretrained weights (models/distill.py)
        structured_frozen_init=True,
    )
    args = m.Args(
        seed=seed, env_id=ENV_ID, total_timesteps=TIMESTEPS,
        capture_video=False, verbose=False, save_model=False,
        clip_config=cc,
    )
    t0 = time.time()
    out = m.train(args, run_name=run_name)
    wall = time.time() - t0
    rets = out["recent_returns"]
    mean_ret = float(sum(rets) / max(len(rets), 1))
    return {"run_name": run_name, "wall_s": round(wall, 1),
            "sps": round(out["sps"], 1),
            "mean_recent_return": round(mean_ret, 4)}


def make_dashboards():
    """Per-seed multi-algorithm comparison through the L5 metrics CLI."""
    from clip_ppo_tpu.metrics import compare_algorithms as ca

    made = []
    for seed in SEEDS:
        base = f"runs/sci3_s{seed}_doorkey"
        algs = [ca.AlgorithmConfig("PPO", f"{base}_PPO_CLEAN",
                                   [f"{base}_PPO_HARD"])]
        for lam in LAMBDAS:
            tag = f"CLIPPPO_l{lam}"
            algs.append(ca.AlgorithmConfig(
                f"CLIP-PPO λ={lam}", f"{base}_{tag}_CLEAN",
                [f"{base}_{tag}_HARD"]))
        if os.path.isdir(f"{base}_FROZENCLIP_CLEAN"):
            algs.append(ca.AlgorithmConfig(
                "FROZEN_CLIP", f"{base}_FROZENCLIP_CLEAN",
                [f"{base}_FROZENCLIP_HARD"]))
        cfg = ca.ComparisonConfig(
            algorithms=tuple(algs),
            save_dir=os.path.join(OUT_DIR, f"seed{seed}"),
        )
        for fn in (ca.plot_ri_comparison_across_algorithms,
                   ca.plot_learning_curves_comparison,
                   ca.plot_success_rate_comparison,
                   ca.plot_robustness_curves_comparison):
            path = fn(cfg)
            if path:
                made.append(path)
                print(f"[dashboard] {path}", flush=True)
    return made


def main():
    dry = "--dry-run" in sys.argv
    skip_frozen = "--skip-frozen" in sys.argv
    grid = build_grid(skip_frozen)
    os.makedirs(OUT_DIR, exist_ok=True)
    results = []
    if os.path.exists(RESULTS_JSON):
        results = json.load(open(RESULTS_JSON))
    done = {r["run_name"] for r in results}

    print(f"science grid: {len(grid)} runs, {len(done)} already done", flush=True)
    if dry:
        for g in grid:
            print(("skip " if g[0] in done else "run  ") + g[0])
        return

    for i, (run_name, alg, seed, lam, ablation, disturbed) in enumerate(grid, 1):
        if run_name in done or os.path.isdir(f"runs/{run_name}"):
            print(f"[{i}/{len(grid)}] skip {run_name} (exists)", flush=True)
            continue
        print(f"[{i}/{len(grid)}] {run_name} ...", flush=True)
        r = run_one(run_name, seed, lam, ablation, disturbed)
        r["algorithm"] = alg
        results.append(r)
        json.dump(results, open(RESULTS_JSON, "w"), indent=1)
        print(f"    done in {r['wall_s']}s  sps={r['sps']}  "
              f"return={r['mean_recent_return']}", flush=True)

    make_dashboards()
    print("science run complete", flush=True)


if __name__ == "__main__":
    main()
