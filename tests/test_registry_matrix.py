"""Every core registered MiniGrid id parses and resets.

The reference trains any registered id via gym.make
(`ppo_minigrid.py:106-119`); this is the full list the upstream library
registers for the families this framework implements — the whole core
MiniGrid suite and the full BabyAI namespace: the GoTo/Open/Pickup/
PutNext single-room and maze tiers, the r4 stragglers (OneRoom, FindObj,
PickupAbove, GoToDoor/GoToObjDoor, PutNext[Carrying], MoveTwoAcross,
OpenTwoDoors/OpenDoorsOrder, PickupLoc), the unlock tier, and the
LevelGen sequencing/composite tier (GoToSeq, Synth*, Boss*). WFC is out
of scope (a separate procedural suite, not part of the reference's
experiment surface). Each id must parse to EnvParams and produce a
well-formed reset state.
"""

import os

import numpy as np
import pytest

import jax

from clip_ppo_tpu.envs.minigrid import core as mg


def _shard(items):
    """Slice the id list per $CLIP_PPO_REGISTRY_SHARD="k/N" (k in 0..N-1).

    Each registered id compiles its own reset program; running all 165 in
    one process exceeds the box's XLA:CPU compile-accumulation crash
    threshold (~120-150 compiles → SIGSEGV in backend_compile_and_load,
    measured r4). run_suite.py launches this file as N shard subprocesses
    so no single process compiles more than ~len/N programs.
    """
    spec = os.environ.get("CLIP_PPO_REGISTRY_SHARD")
    if not spec:
        return items
    k, n = (int(p) for p in spec.split("/"))
    return items[k::n]

REGISTERED = [
    # empty.py
    "MiniGrid-Empty-5x5-v0", "MiniGrid-Empty-Random-5x5-v0",
    "MiniGrid-Empty-6x6-v0", "MiniGrid-Empty-Random-6x6-v0",
    "MiniGrid-Empty-8x8-v0", "MiniGrid-Empty-16x16-v0",
    # doorkey.py
    "MiniGrid-DoorKey-5x5-v0", "MiniGrid-DoorKey-6x6-v0",
    "MiniGrid-DoorKey-8x8-v0", "MiniGrid-DoorKey-16x16-v0",
    # fourrooms.py / lavagap.py / distshift.py
    "MiniGrid-FourRooms-v0",
    "MiniGrid-LavaGapS5-v0", "MiniGrid-LavaGapS6-v0", "MiniGrid-LavaGapS7-v0",
    "MiniGrid-DistShift1-v0", "MiniGrid-DistShift2-v0",
    # multiroom.py / crossing.py
    "MiniGrid-MultiRoom-N2-S4-v0", "MiniGrid-MultiRoom-N4-S5-v0",
    "MiniGrid-MultiRoom-N6-v0",
    "MiniGrid-SimpleCrossingS9N1-v0", "MiniGrid-SimpleCrossingS9N2-v0",
    "MiniGrid-SimpleCrossingS9N3-v0", "MiniGrid-SimpleCrossingS11N5-v0",
    "MiniGrid-LavaCrossingS9N1-v0", "MiniGrid-LavaCrossingS9N2-v0",
    "MiniGrid-LavaCrossingS9N3-v0", "MiniGrid-LavaCrossingS11N5-v0",
    # dynamicobstacles.py
    "MiniGrid-Dynamic-Obstacles-5x5-v0",
    "MiniGrid-Dynamic-Obstacles-Random-5x5-v0",
    "MiniGrid-Dynamic-Obstacles-6x6-v0",
    "MiniGrid-Dynamic-Obstacles-Random-6x6-v0",
    "MiniGrid-Dynamic-Obstacles-8x8-v0",
    "MiniGrid-Dynamic-Obstacles-16x16-v0",
    # unlock / unlockpickup / blockedunlockpickup
    "MiniGrid-Unlock-v0", "MiniGrid-UnlockPickup-v0",
    "MiniGrid-BlockedUnlockPickup-v0",
    # keycorridor.py
    "MiniGrid-KeyCorridorS3R1-v0", "MiniGrid-KeyCorridorS3R2-v0",
    "MiniGrid-KeyCorridorS3R3-v0", "MiniGrid-KeyCorridorS4R3-v0",
    "MiniGrid-KeyCorridorS5R3-v0", "MiniGrid-KeyCorridorS6R3-v0",
    # obstructedmaze.py (incl. the -v1 bugfix registrations)
    "MiniGrid-ObstructedMaze-1Dl-v0", "MiniGrid-ObstructedMaze-1Dlh-v0",
    "MiniGrid-ObstructedMaze-1Dlhb-v0", "MiniGrid-ObstructedMaze-1Dlhb-v1",
    "MiniGrid-ObstructedMaze-2Dl-v0", "MiniGrid-ObstructedMaze-2Dlh-v0",
    "MiniGrid-ObstructedMaze-2Dlhb-v0", "MiniGrid-ObstructedMaze-2Dlhb-v1",
    "MiniGrid-ObstructedMaze-1Q-v0", "MiniGrid-ObstructedMaze-1Q-v1",
    "MiniGrid-ObstructedMaze-2Q-v0", "MiniGrid-ObstructedMaze-2Q-v1",
    "MiniGrid-ObstructedMaze-Full-v0", "MiniGrid-ObstructedMaze-Full-v1",
    # lockedroom.py / memory.py / playground.py
    "MiniGrid-LockedRoom-v0",
    "MiniGrid-MemoryS7-v0", "MiniGrid-MemoryS9-v0", "MiniGrid-MemoryS11-v0",
    "MiniGrid-MemoryS13-v0", "MiniGrid-MemoryS13Random-v0",
    "MiniGrid-MemoryS17Random-v0",
    "MiniGrid-Playground-v0",
    # redbluedoors.py
    "MiniGrid-RedBlueDoors-6x6-v0", "MiniGrid-RedBlueDoors-8x8-v0",
    # mission-conditioned quartet
    "MiniGrid-GoToDoor-5x5-v0", "MiniGrid-GoToDoor-6x6-v0",
    "MiniGrid-GoToDoor-8x8-v0",
    "MiniGrid-Fetch-5x5-N2-v0", "MiniGrid-Fetch-6x6-N2-v0",
    "MiniGrid-Fetch-8x8-N3-v0",
    "MiniGrid-GoToObject-6x6-N2-v0", "MiniGrid-GoToObject-8x8-N2-v0",
    "MiniGrid-PutNear-6x6-N2-v0", "MiniGrid-PutNear-8x8-N3-v0",
    # babyai/goto.py (single-room GoTo tier)
    "BabyAI-GoToRedBallGrey-v0", "BabyAI-GoToRedBall-v0",
    "BabyAI-GoToRedBallNoDists-v0",
    "BabyAI-GoToObjS4-v0", "BabyAI-GoToObjS6-v0", "BabyAI-GoToObj-v0",
    "BabyAI-GoToLocalS5N2-v0", "BabyAI-GoToLocalS6N2-v0",
    "BabyAI-GoToLocalS6N3-v0", "BabyAI-GoToLocalS6N4-v0",
    "BabyAI-GoToLocalS7N4-v0", "BabyAI-GoToLocalS7N5-v0",
    "BabyAI-GoToLocalS8N2-v0", "BabyAI-GoToLocalS8N3-v0",
    "BabyAI-GoToLocalS8N4-v0", "BabyAI-GoToLocalS8N5-v0",
    "BabyAI-GoToLocalS8N6-v0", "BabyAI-GoToLocalS8N7-v0",
    "BabyAI-GoToLocal-v0",
    # babyai/putnext.py / pickup.py (single-room levels)
    "BabyAI-PutNextLocalS5N3-v0", "BabyAI-PutNextLocalS6N4-v0",
    "BabyAI-PutNextLocal-v0",
    "BabyAI-PickupDist-v0", "BabyAI-PickupDistDebug-v0",
    # babyai/goto.py GoToRedBlueBall + babyai/open.py single-target tier
    "BabyAI-GoToRedBlueBall-v0",
    "BabyAI-OpenRedDoor-v0",
    "BabyAI-OpenDoor-v0", "BabyAI-OpenDoorDebug-v0",
    "BabyAI-OpenDoorColor-v0", "BabyAI-OpenDoorLoc-v0",
    # babyai/other.py (mixed-verb single-room level)
    "BabyAI-ActionObjDoor-v0",
    # babyai maze tier (goto.py GoTo/GoToObjMaze*, pickup.py)
    "BabyAI-GoTo-v0", "BabyAI-GoToOpen-v0",
    "BabyAI-GoToObjMaze-v0", "BabyAI-GoToObjMazeOpen-v0",
    "BabyAI-GoToObjMazeS4R2-v0", "BabyAI-GoToObjMazeS4-v0",
    "BabyAI-GoToObjMazeS5-v0", "BabyAI-GoToObjMazeS6-v0",
    "BabyAI-GoToObjMazeS7-v0",
    "BabyAI-Pickup-v0", "BabyAI-UnblockPickup-v0",
    # babyai maze tier (open.py Open)
    "BabyAI-Open-v0",
    # babyai/other.py stragglers (r4)
    "BabyAI-OneRoomS8-v0", "BabyAI-OneRoomS12-v0",
    "BabyAI-OneRoomS16-v0", "BabyAI-OneRoomS20-v0",
    "BabyAI-FindObjS5-v0", "BabyAI-FindObjS6-v0", "BabyAI-FindObjS7-v0",
    "BabyAI-MoveTwoAcrossS5N2-v0", "BabyAI-MoveTwoAcrossS8N9-v0",
    # babyai/pickup.py + goto.py stragglers (r4)
    "BabyAI-PickupAbove-v0", "BabyAI-PickupLoc-v0",
    "BabyAI-GoToDoor-v0", "BabyAI-GoToObjDoor-v0",
    # babyai/putnext.py (r4)
    "BabyAI-PutNextS4N1-v0", "BabyAI-PutNextS5N1-v0",
    "BabyAI-PutNextS5N2-v0", "BabyAI-PutNextS6N3-v0",
    "BabyAI-PutNextS7N4-v0", "BabyAI-PutNextS5N2Carrying-v0",
    "BabyAI-PutNextS6N3Carrying-v0", "BabyAI-PutNextS7N4Carrying-v0",
    # babyai/open.py sequencing (r4)
    "BabyAI-OpenTwoDoors-v0", "BabyAI-OpenRedBlueDoors-v0",
    "BabyAI-OpenRedBlueDoorsDebug-v0",
    "BabyAI-OpenDoorsOrderN2-v0", "BabyAI-OpenDoorsOrderN4-v0",
    "BabyAI-OpenDoorsOrderN2Debug-v0", "BabyAI-OpenDoorsOrderN4Debug-v0",
    # babyai/unlock.py (r4)
    "BabyAI-Unlock-v0", "BabyAI-UnlockLocal-v0",
    "BabyAI-UnlockLocalDist-v0", "BabyAI-KeyInBox-v0",
    "BabyAI-UnlockPickup-v0", "BabyAI-UnlockPickupDist-v0",
    "BabyAI-BlockedUnlockPickup-v0", "BabyAI-UnlockToUnlock-v0",
    "BabyAI-GoToImpUnlock-v0",
    # babyai/synth.py LevelGen tier (r4)
    "BabyAI-GoToSeq-v0", "BabyAI-GoToSeqS5R2-v0",
    "BabyAI-Synth-v0", "BabyAI-SynthS5R2-v0",
    "BabyAI-SynthLoc-v0", "BabyAI-SynthSeq-v0",
    "BabyAI-MiniBossLevel-v0", "BabyAI-BossLevel-v0",
    "BabyAI-BossLevelNoUnlock-v0",
]


@pytest.mark.parametrize("env_id", _shard(REGISTERED))
def test_registered_id_parses_and_resets(env_id):
    params = mg.parse_env_id(env_id)
    st = mg.reset(params, jax.random.PRNGKey(0))
    g = np.asarray(st.grid)
    assert g.shape == (params.width, params.height, 3)
    # well-formed: an impassable perimeter (wall, or a border door in
    # GoToDoor; MultiRoom leaves out-of-room border cells EMPTY but walls
    # every room), and the agent on a free in-bounds cell
    border = np.concatenate([g[0, :, 0], g[-1, :, 0], g[:, 0, 0], g[:, -1, 0]])
    assert np.isin(border, (mg.WALL, mg.DOOR, mg.EMPTY)).all()
    x, y = map(int, np.asarray(st.agent_pos))
    assert 0 < x < params.width - 1 and 0 < y < params.height - 1
    assert g[x, y, 0] in (mg.EMPTY, mg.FLOOR)
    assert int(st.step_count) == 0
