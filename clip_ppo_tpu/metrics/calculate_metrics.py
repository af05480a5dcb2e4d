"""Shared metric math over TensorBoard runs: RI, AUC, success rates.

Behavior-compatible rebuild of the reference's evaluation core
(`metrics/calculate_metrics.py:16-243`) — these functions machine-read the
artifacts the training CLIs emit (episodic-return scalars, the
``config/disturbance_severity`` text tensor), so tag names, fallback
orders, windowing and fill rules are preserved exactly:

* scalar-tag fallbacks ``charts/episodic_return`` → ``episodic_return`` →
  ``charts/returns`` (lengths analogous);
* Robustness Index = rolling(50, min_periods=1)-mean disturbed / clean,
  truncated to the shorter run, masked where clean ≤ 0.1, then
  ffill → bfill → 0;
* AUC = trapezoid over (timestep, return), normalized by timestep range;
* success rate = % of episodes with return > threshold (final-window
  variant over the last 100).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

from clip_ppo_tpu.ops.severity import DisturbanceSeverity

RETURN_TAGS = ("charts/episodic_return", "episodic_return", "charts/returns")
LENGTH_TAGS = ("charts/episodic_length", "episodic_length", "charts/lengths")
SEVERITY_TAG = "config/disturbance_severity/text_summary"

_SEVERITY_FROM_TEXT = {
    "CLEAN": DisturbanceSeverity.NONE,
    "MILD": DisturbanceSeverity.MILD,
    "MODERATE": DisturbanceSeverity.MODERATE,
    "HARD": DisturbanceSeverity.HARD,
    "SEVERE": DisturbanceSeverity.SEVERE,
}


def _load_accumulator(run_path: str) -> EventAccumulator:
    ea = EventAccumulator(run_path)
    ea.Reload()
    return ea


def load_tensorboard_run(
    run_path: str,
) -> Tuple[List[int], List[float], List[float]]:
    """(timesteps, returns, episode_lengths) from a TB run directory, with
    the reference's tag-name fallback lists."""
    ea = _load_accumulator(run_path)
    scalar_tags = ea.Tags()["scalars"]

    returns_data = None
    for tag in RETURN_TAGS:
        if tag in scalar_tags:
            returns_data = ea.Scalars(tag)
            break
    if returns_data is None:
        raise ValueError(
            "Could not find episodic return data in any expected tags: "
            f"{list(RETURN_TAGS)}"
        )
    timesteps = [x.step for x in returns_data]
    returns = [x.value for x in returns_data]

    episode_lengths: List[float] = []
    for tag in LENGTH_TAGS:
        if tag in scalar_tags:
            episode_lengths = [x.value for x in ea.Scalars(tag)]
            break
    return timesteps, returns, episode_lengths


def get_disturbance_severity(run_path: str) -> DisturbanceSeverity:
    """Severity recorded as the TB *text* tensor by the training CLIs."""
    ea = _load_accumulator(run_path)
    if SEVERITY_TAG in ea.Tags().get("tensors", []):
        text_data = ea.Tensors(SEVERITY_TAG)
        if text_data:
            severity_text = text_data[0].tensor_proto.string_val[0].decode("utf-8")
            return _SEVERITY_FROM_TEXT.get(severity_text, DisturbanceSeverity.NONE)
    raise ValueError(f"Unable to find disturbance severity in run_path {run_path}.")


def compute_robustness_index_over_time(
    clean_run_path: str, disturbed_run_path: str, window_size: int = 50
) -> pd.DataFrame:
    """RI(t) = rolling-mean disturbed / clean, with the clean floor and
    fill rules of the reference (columns: timestep, clean_return,
    disturbed_return, robustness_index)."""
    clean_ts, clean_ret, _ = load_tensorboard_run(clean_run_path)
    dist_ts, dist_ret, _ = load_tensorboard_run(disturbed_run_path)

    clean_roll = (
        pd.Series(clean_ret).rolling(window=window_size, min_periods=1).mean()
    )
    dist_roll = (
        pd.Series(dist_ret).rolling(window=window_size, min_periods=1).mean()
    )

    n = min(len(clean_roll), len(dist_roll))
    df = pd.DataFrame(
        {
            "timestep": np.asarray(clean_ts[:n]),
            "clean_return": clean_roll.iloc[:n].to_numpy(),
            "disturbed_return": dist_roll.iloc[:n].to_numpy(),
        }
    )

    min_clean_threshold = 0.1
    ri = np.full(n, np.nan)
    valid = df["clean_return"].to_numpy() > min_clean_threshold
    ri[valid] = df["disturbed_return"].to_numpy()[valid] / df["clean_return"].to_numpy()[valid]
    df["robustness_index"] = (
        pd.Series(ri).ffill().bfill().fillna(0).to_numpy()
    )

    print(f"Final robustness index: {df['robustness_index'].iloc[-1]:.3f}")
    print(f"Mean robustness index: {df['robustness_index'].mean():.3f}")
    return df


def compute_robustness_index(
    clean_run_path: str, disturbed_run_path: str, window_size: int = 50
) -> float:
    """Final-value RI (last row of the over-time series)."""
    df = compute_robustness_index_over_time(
        clean_run_path, disturbed_run_path, window_size
    )
    return float(df["robustness_index"].iloc[-1])


def compute_auc_metric(timesteps: List[int], returns: List[float]) -> float:
    """Normalized trapezoidal AUC of a learning curve (== time-averaged
    return over the logged span)."""
    if len(timesteps) < 2:
        return 0.0
    t = np.asarray(timesteps, dtype=np.float64)
    r = np.asarray(returns, dtype=np.float64)
    span = t[-1] - t[0]
    if span <= 0:
        return 0.0
    return float(np.trapezoid(r, t) / span)


def compute_success_rate(run_path: str, success_threshold: float = 0.0) -> float:
    """% of all episodes with return > threshold."""
    _, returns, _ = load_tensorboard_run(run_path)
    if not returns:
        return 0.0
    return 100.0 * sum(1 for r in returns if r > success_threshold) / len(returns)


def compute_final_success_rate(
    run_path: str, window_size: int = 100, success_threshold: float = 0.0
) -> float:
    """% of the last ``window_size`` episodes with return > threshold."""
    _, returns, _ = load_tensorboard_run(run_path)
    if not returns:
        return 0.0
    final = returns[-window_size:]
    return 100.0 * sum(1 for r in final if r > success_threshold) / len(final)
