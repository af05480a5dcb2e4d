"""VideoRecorder: episode splitting, schedule, and mp4 artifact parity."""

import os

import numpy as np

from clip_ppo_tpu.io.video import VideoRecorder, capped_cubic_video_schedule


def test_capped_cubic_schedule():
    hits = [e for e in range(100) if capped_cubic_video_schedule(e)]
    assert hits == [0, 1, 8, 27, 64]
    assert capped_cubic_video_schedule(1000) and capped_cubic_video_schedule(2000)
    assert not capped_cubic_video_schedule(1001)


def test_writes_mp4_with_reference_naming(tmp_path):
    """`rl-video-episode-{k}.mp4`, the RecordVideo artifact name
    (`ppo_minigrid.py:115-116`)."""
    rec = VideoRecorder(str(tmp_path), fps=30, upscale=1)
    frames = np.random.randint(0, 255, (10, 84, 84, 3), np.uint8)
    dones = np.zeros(10, bool)
    dones[4] = dones[9] = True  # episodes 0 (scheduled) and 1 (scheduled)
    written = rec.add_rollout(frames, dones)
    assert len(written) == 2
    for k, path in enumerate(written):
        assert os.path.basename(path) == f"rl-video-episode-{k}.mp4"
        assert os.path.getsize(path) > 0
    # decodable by OpenCV
    import cv2

    cap = cv2.VideoCapture(written[0])
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (84, 84, 3)
        n += 1
    cap.release()
    assert n == 5


def test_grayscale_stack_and_schedule_skips(tmp_path):
    rec = VideoRecorder(str(tmp_path), upscale=2)
    # six 1-step episodes: episodes 0 and 1 scheduled, 2..5 not
    for _ in range(6):
        rec.add_rollout(
            np.zeros((1, 84, 84, 4), np.uint8), np.ones(1, bool)
        )
    names = sorted(os.listdir(tmp_path))
    assert names == ["rl-video-episode-0.mp4", "rl-video-episode-1.mp4"]
    rec.close()
