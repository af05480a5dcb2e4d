"""Metric-math tests against hand-computed fixtures on synthetic TB runs."""

import os

import numpy as np
import pytest

from clip_ppo_tpu.io import SummaryWriter
from clip_ppo_tpu.metrics import (
    compute_auc_metric,
    compute_final_success_rate,
    compute_robustness_index,
    compute_robustness_index_over_time,
    compute_success_rate,
    get_disturbance_severity,
    load_tensorboard_run,
)
from clip_ppo_tpu.ops.severity import DisturbanceSeverity


def _write_run(path, returns, severity=None, steps=None):
    w = SummaryWriter(str(path))
    steps = steps or [1024 * (i + 1) for i in range(len(returns))]
    if severity is not None:
        w.add_text("config/disturbance_severity", severity)
    for s, r in zip(steps, returns):
        w.add_scalar("charts/episodic_return", r, s)
        w.add_scalar("charts/episodic_length", 10, s)
    w.close()
    return str(path)


@pytest.fixture
def runs(tmp_path):
    clean = _write_run(tmp_path / "clean", [1.0] * 60, "CLEAN")
    disturbed = _write_run(tmp_path / "hard", [0.5] * 60, "HARD")
    return clean, disturbed


def test_load_run_roundtrip(runs):
    clean, _ = runs
    ts, ret, lengths = load_tensorboard_run(clean)
    assert len(ts) == 60 and len(ret) == 60 and len(lengths) == 60
    assert ret[0] == pytest.approx(1.0)
    assert ts[0] == 1024


def test_severity_readback(runs):
    clean, disturbed = runs
    assert get_disturbance_severity(clean) == DisturbanceSeverity.NONE
    assert get_disturbance_severity(disturbed) == DisturbanceSeverity.HARD


def test_severity_missing_raises(tmp_path):
    run = _write_run(tmp_path / "nosev", [1.0] * 3)
    with pytest.raises(ValueError):
        get_disturbance_severity(run)


def test_robustness_index_constant_runs(runs):
    clean, disturbed = runs
    ri = compute_robustness_index(clean, disturbed)
    assert ri == pytest.approx(0.5)
    df = compute_robustness_index_over_time(clean, disturbed)
    assert list(df.columns) == [
        "timestep", "clean_return", "disturbed_return", "robustness_index",
    ]
    assert df["robustness_index"].iloc[-1] == pytest.approx(0.5)


def test_robustness_index_clean_floor(tmp_path):
    """Clean below the 0.1 floor → NaN → ffill/bfill → 0 when never valid."""
    clean = _write_run(tmp_path / "c0", [0.05] * 10)
    dist = _write_run(tmp_path / "d0", [0.04] * 10)
    df = compute_robustness_index_over_time(clean, dist)
    assert (df["robustness_index"] == 0).all()


def test_robustness_index_bfill(tmp_path):
    """Early clean < floor, later valid → early values backfilled."""
    clean = _write_run(tmp_path / "c1", [0.0] * 5 + [1.0] * 200)
    dist = _write_run(tmp_path / "d1", [0.8] * 205)
    df = compute_robustness_index_over_time(clean, dist, window_size=1)
    assert df["robustness_index"].iloc[0] == pytest.approx(0.8)
    assert df["robustness_index"].iloc[-1] == pytest.approx(0.8)


def test_robustness_truncates_to_shorter(tmp_path):
    clean = _write_run(tmp_path / "c2", [1.0] * 100)
    dist = _write_run(tmp_path / "d2", [0.5] * 40)
    df = compute_robustness_index_over_time(clean, dist)
    assert len(df) == 40


def test_auc_metric():
    # Linear ramp 0→1 over [0, 100]: time-averaged value = 0.5.
    ts = list(range(0, 101))
    rets = [t / 100 for t in ts]
    assert compute_auc_metric(ts, rets) == pytest.approx(0.5)
    assert compute_auc_metric([5], [1.0]) == 0.0
    assert compute_auc_metric([], []) == 0.0


def test_success_rates(tmp_path):
    returns = [0.0] * 30 + [1.0] * 70
    run = _write_run(tmp_path / "sr", returns)
    assert compute_success_rate(run) == pytest.approx(70.0)
    # Final 100 → whole run here; final 50 would be all successes.
    assert compute_final_success_rate(run, window_size=50) == pytest.approx(100.0)
    assert compute_final_success_rate(run, window_size=100) == pytest.approx(70.0)


def test_plot_clis(tmp_path, runs):
    """The three plotting entry points render files end-to-end."""
    clean, disturbed = runs
    from clip_ppo_tpu.metrics import (
        compare_algorithm_disturbances as cad,
        compare_algorithms as ca,
        evaluate_algorithm as ea,
    )

    cfg = ea.EvaluationConfig(
        clean_run_path=clean, disturbed_run_path=disturbed,
        save_dir=str(tmp_path / "p1"),
    )
    assert os.path.exists(ea.plot_mean_return_vs_timesteps(cfg))
    assert os.path.exists(ea.plot_auc_comparison(cfg))
    assert os.path.exists(ea.plot_robustness_analysis(cfg))

    cfg2 = cad.RobustnessConfig(
        algorithm_name="PPO", clean_run_path=clean,
        disturbance_runs=(disturbed,), save_dir=str(tmp_path / "p2"),
    )
    assert os.path.exists(cad.plot_ri_across_disturbances(cfg2))
    assert os.path.exists(cad.plot_robustness_curves_over_time(cfg2))

    cfg3 = ca.ComparisonConfig(
        algorithms=(f"PPO:{clean}:{disturbed}", f"CLIP_PPO:{clean}:{disturbed}"),
        save_dir=str(tmp_path / "p3"),
    )
    assert os.path.exists(ca.plot_ri_comparison_across_algorithms(cfg3))
    assert os.path.exists(ca.plot_learning_curves_comparison(cfg3))
    assert os.path.exists(ca.plot_success_rate_comparison(cfg3))
    assert os.path.exists(ca.plot_robustness_curves_comparison(cfg3))


def test_algorithm_spec_parse():
    from clip_ppo_tpu.metrics.compare_algorithms import parse_algorithm_spec

    a = parse_algorithm_spec("PPO:runs/clean:runs/d1,runs/d2")
    assert a.name == "PPO"
    assert a.clean_run_path == "runs/clean"
    assert a.disturbed_run_paths == ["runs/d1", "runs/d2"]
    b = parse_algorithm_spec("FROZEN:runs/clean")
    assert b.disturbed_run_paths == []
