"""Pure-JAX MiniGrid: functional, jittable grid-world environments.

TPU-native replacement for the `minigrid` dependency the reference drives
through gymnasium (`ppo_minigrid.py:106-119`). Instead of stepping Python
objects on the host and shipping observations to the device every step
(the reference's per-step H2D/D2H sync, `ppo_minigrid.py:255,265`), the
environment state lives on device as arrays and `reset`/`step`/`observe`
are pure functions — vmappable over thousands of envs and foldable into
the training loop's `lax.scan`, so an entire PPO iteration compiles into
one XLA program.

Semantics mirror MiniGrid exactly (verified by the golden tests):

* object/color/state integer encodings and the 7×7 egocentric partial
  view with the agent at view cell (3, 6) facing up;
* out-of-view-bounds cells read as grey walls; carried object rendered at
  the agent's view cell;
* shadow-casting visibility (``process_vis``) for envs without
  ``see_through_walls``;
* action set (left, right, forward, pickup, drop, toggle, done), goal
  reward ``1 - 0.9 * step_count / max_steps``, truncation at
  ``max_steps``;
* Empty-NxN (fixed or random start) and DoorKey-NxN generation,
  including DoorKey's door-row quirk of sampling with ``width`` instead
  of ``height``.
"""

from __future__ import annotations

import dataclasses
import re
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# --- Integer encodings (MiniGrid-compatible) -------------------------------

UNSEEN, EMPTY, WALL, FLOOR, DOOR, KEY, BALL, BOX, GOAL, LAVA, AGENT = range(11)
RED, GREEN, BLUE, PURPLE, YELLOW, GREY = range(6)
OPEN, CLOSED, LOCKED = range(3)

IDX_TO_OBJECT = {
    UNSEEN: "unseen", EMPTY: "empty", WALL: "wall", FLOOR: "floor",
    DOOR: "door", KEY: "key", BALL: "ball", BOX: "box", GOAL: "goal",
    LAVA: "lava", AGENT: "agent",
}
IDX_TO_COLOR = {RED: "red", GREEN: "green", BLUE: "blue", PURPLE: "purple",
                YELLOW: "yellow", GREY: "grey"}

# dir 0=right(+x), 1=down(+y), 2=left, 3=up
DIR_TO_VEC = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.int32)
DIR_NAMES = ("right", "down", "left", "up")

VIEW_SIZE = 7
_AGENT_VIEW_POS = (VIEW_SIZE // 2, VIEW_SIZE - 1)  # (3, 6)

# Actions
A_LEFT, A_RIGHT, A_FORWARD, A_PICKUP, A_DROP, A_TOGGLE, A_DONE = range(7)
NUM_ACTIONS = 7


@dataclasses.dataclass(frozen=True)
class EnvParams:
    """Static environment configuration (hashable; safe as a jit static arg)."""

    kind: str  # "empty" | "doorkey" | "fourrooms" | "lavagap" | "multiroom"
    #            | "crossing" | "unlock" | "dynobs" | "distshift" | "redblue"
    #            | "keycorridor" | "lockedroom" | "memory" | "obstructedfull"
    #            | "playground" | "gotodoor" | "fetch" | "gotoobject"
    #            | "putnear" | "babyai_goto" | "babyai_putnext"
    #            | "babyai_pickup" | "babyai_openred" | "babyai_opendoor"
    #            | "babyai_actionobj" | "babyai_gotomaze"
    width: int
    height: int
    max_steps: int
    see_through_walls: bool
    random_start: bool = False  # Empty-Random variants
    # MultiRoom-N{n}[-S{s}] family
    min_rooms: int = 0
    max_rooms: int = 0
    max_room_size: int = 0
    # {Simple,Lava}CrossingS{n}N{k} family
    num_crossings: int = 0
    obstacle: int = 0  # WALL (SimpleCrossing) or LAVA (LavaCrossing)
    # Success condition: "goal" (step onto GOAL), "open_door" (Unlock —
    # terminating reward when a toggle leaves the door open, upstream
    # minigrid/envs/unlock.py step()), "pickup_box" (UnlockPickup —
    # terminating reward when the box is picked up, unlockpickup.py) or
    # "red_then_blue" (RedBlueDoors — episode ends when the blue door is
    # open post-step; reward only if the red door was open before it,
    # upstream redbluedoors.py step()).
    success: str = "goal"
    # DistShift family: grid row of the 3-cell lava strip (2 or 5).
    strip_row: int = 0
    # BlockedUnlockPickup / ObstructedMaze: a ball blocks the cell left
    # of the locked door.
    blocked_door: bool = False
    # ObstructedMaze: the key hides inside a box (revealed by toggle).
    key_in_box: bool = False
    # pickup_ball success: required ball color (−1 = any; ObstructedMaze
    # targets the BLUE ball specifically, so the blocking ball does not
    # terminate).
    target_color: int = -1
    # Dynamic-Obstacles family
    n_obstacles: int = 0   # moving balls; forward into ANY non-goal cell
    #                        terminates with reward −1 (upstream quirk)
    num_actions: int = NUM_ACTIONS  # 3 for Dynamic-Obstacles
    # Mission-conditioned families (Fetch/GoToObject/PutNear/BabyAI-GoTo*):
    # number of candidate objects; the episode's target lives in
    # EnvState.target.
    num_objs: int = 0
    # BabyAI GoToRedBallGrey: distractors are recolored grey.
    grey_dists: bool = False
    # BabyAI PickupDistDebug / OpenDoorDebug: a pickup (resp. door
    # toggle) that does not satisfy the mission fails the episode
    # (PickupInstr / OpenInstr strict=True).
    strict: bool = False
    # BabyAI OpenDoor: how the mission describes the target door —
    # "color" (the first door's color), "loc" (a location word relative
    # to the agent's start pose), or "" = sampled per episode.
    select_by: str = ""
    # BabyAI GoToRedBlueBall: the target is a ball colored red or blue
    # (uniform per episode) and no distractor may be a red or blue ball.
    rb_target: bool = False
    # Memory S{n}Random variants: re-sample the hallway length per episode.
    random_length: bool = False
    # BabyAI maze tier (GoToOpen / GoToObjMazeOpen): open_all_doors()
    # after generation.
    doors_open: bool = False
    # BabyAI UnblockPickup: reject layouts where every object IS
    # reachable (upstream requires at least one blocked object).
    invert_reach: bool = False
    # ObstructedMaze Full family (2Dl*/1Q/2Q/Full): the (col, row) of the
    # room the agent starts in; num_quarters rides ``min_rooms``.
    agent_room: tuple[int, int] = (0, 0)
    # BabyAI maze tier: place the agent in ``agent_room`` instead of a
    # uniformly random room (FindObj / PickupAbove: place_agent(1, 1)).
    fixed_agent_room: bool = False
    # BabyAI FindObj/PickupAbove/OneRoom: the mission names the type
    # only ("pick up the ball") — the verifier's color is wildcarded.
    type_only: bool = False
    # BabyAI PickupAbove: the mission object's room (col, row);
    # (-1, -1) = a uniformly random room (FindObj).
    obj_room: tuple[int, int] = (-1, -1)
    # BabyAI PickupAbove: a door added before connect_all on wall ``dir``
    # of room (i, j) — upstream's explicit add_door(1, 1, 3).
    predoor: tuple[int, int, int] = (-1, -1, -1)
    # BabyAI PutNext*Carrying: the agent starts holding the move object
    # (upstream putnext.py reset() picks it off the grid post-gen).
    start_carrying: bool = False
    # BabyAI unlock tier (Unlock / GoToImpUnlock): one random room gets
    # a LOCKED random-color door; the matching key lands in a different
    # room; the agent starts outside the locked room. Unlock keeps the
    # locked door color unique among connect_all doors with prob 1/2.
    locked_room: bool = False
    # GoToImpUnlock: the mission object is placed inside the locked
    # room (GoToInstr on its type+color) instead of the door mission.
    target_in_locked: bool = False
    # GoToImpUnlock: exactly 2 distractors per non-locked room instead
    # of uniformly random rooms (num_objs must be 2·(C·R − 1)).
    dists_per_room: bool = False
    # BabyAI LevelGen tier (GoToSeq / Synth / SynthLoc / SynthSeq /
    # MiniBossLevel / BossLevel[NoUnlock]): the probability a random
    # room is locked per episode, the instruction grammar, the verb
    # pool, and whether location language is sampled.
    locked_room_prob: float = 0.0
    instr_kinds: str = "action"          # comma-set of action|and|seq
    action_kinds: str = "goto"           # comma-set of goto|pickup|open|putnext
    locations: bool = False
    # LevelGen unblocking=False (GoToSeq): run check_objs_reachable.
    check_reachable: bool = False
    # BabyAI two-door sequencing (OpenTwoDoors / OpenDoorsOrder):
    # forced door colors (-1 = random) and the instruction composition —
    # "before", "after", or "" = sample uniformly over
    # single/before/after per episode (OpenDoorsOrder gen_mission).
    first_color: int = -1
    second_color: int = -1
    comp: str = ""

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        return (self.width, self.height, 3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EnvState:
    """Per-environment dynamic state (a pytree of arrays, lives on device)."""

    grid: jax.Array        # [W, H, 3] int8: (object, color, state) per cell
    agent_pos: jax.Array   # [2] int32 (x, y)
    agent_dir: jax.Array   # [] int32
    carrying: jax.Array    # [3] int8 (object, color, state); object==0 → nothing
    step_count: jax.Array  # [] int32
    rng: jax.Array         # PRNG key consumed by autoreset
    # Mission target for the mission-conditioned families, zeros elsewhere.
    # Layout: GoToDoor/GoToObject [obj, color, x, y, 0...]; Fetch
    # [obj, color, 0...]; PutNear [move_obj, move_color, near_obj,
    # near_color, near_x, near_y, 0, 0]. (The reference consumes these
    # envs through ImgObsWrapper, which drops the mission string,
    # `ppo_minigrid.py:110` — the target still drives reward semantics.)
    target: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros(8, jnp.int32)
    )
    # BabyAI composite-instruction machine (success="babyai_seq") — up
    # to 4 atomic instructions (upstream verifier.py trees bottom out at
    # Seq(And(a,b), And(c,d))); zeros for every other family.
    # Row layout [12]: [verb (0=unused, 1=goto, 2=open, 3=pickup,
    # 4=putnext), type_a, color_a, type_b, color_b (putnext's fixed
    # desc), flags (bit0: positional match set — loc-filtered ObjDesc;
    # bit1: ActionInstr strict), p0..p5 (packed match positions + 1,
    # 0 = empty slot)]. The composition lives in ``target``:
    # target[0] = comp (0 = single slot 0, 1 = and(0,1),
    # 2 = before(A, B), 3 = after(A, B)) with A = slots 0-1,
    # B = slots 2-3 (slot verb 0 = absent half); target[1] = the
    # SeqInstr-level strict bit (completing B first fails).
    instr: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((4, 12), jnp.int32)
    )
    # Per-slot verifier state: [:, 0] done latch (upstream SeqInstr's
    # a_done/b_done), [:, 1] carrying-a-tracked-object bit (positional
    # ObjDesc identity tracking across pickup/drop).
    instr_state: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((4, 2), jnp.int32)
    )


def parse_env_id(env_id: str) -> EnvParams:
    """Map a MiniGrid env id string to EnvParams.

    Supported families (the reference trains any registered id via
    ``gym.make``, `ppo_minigrid.py:106-119`; these cover its experiment
    grid plus the classic curriculum envs): ``Empty[-Random]-NxN``,
    ``DoorKey-NxN``, ``FourRooms``, ``LavaGapSn``, ``MultiRoom-Nn[-Ss]``,
    ``SimpleCrossingSsNn``, ``LavaCrossingSsNn``, ``Unlock``,
    ``UnlockPickup``, ``BlockedUnlockPickup``,
    ``ObstructedMaze-1Dl{,h,hb}``, ``ObstructedMaze-2Dl{,h,hb}``,
    ``ObstructedMaze-{1Q,2Q,Full}``, ``Playground``, ``KeyCorridorSsRr``,
    ``Dynamic-Obstacles[-Random]-NxN``, ``DistShift{1,2}``,
    ``RedBlueDoors-NxN``, ``LockedRoom``, ``MemoryS{n}[Random]``, and the
    mission-conditioned quartet ``GoToDoor-NxN``, ``Fetch-NxN-Nk``,
    ``GoToObject-NxN-Nk``, ``PutNear-NxN-Nk``, plus the single-room
    BabyAI tier ``BabyAI-GoToRedBall{,Grey,NoDists}``,
    ``BabyAI-GoToRedBlueBall``, ``BabyAI-GoToObj[Ss]``,
    ``BabyAI-GoToLocal[SsNn]``, ``BabyAI-PutNextLocal[SsNn]``,
    ``BabyAI-PickupDist[Debug]``, the BabyAI Open tier
    ``BabyAI-OpenRedDoor``, ``BabyAI-OpenDoor[Color|Loc][Debug]``,
    the mixed-verb ``BabyAI-ActionObjDoor``, and the BabyAI maze tier
    ``BabyAI-GoTo[Open]``, ``BabyAI-GoToObjMaze[Open|S4R2|S4|S5|S6|S7]``,
    ``BabyAI-Pickup``, ``BabyAI-UnblockPickup``, ``BabyAI-Open``.
    Unknown ids raise with the supported list.
    """
    m = re.match(r"MiniGrid-DistShift(1|2)(-v\d+)?$", env_id)
    if m:
        # DistShiftEnv(width=9, height=7, strip2_row=2|5): 3-cell lava
        # strip at x ∈ [3, 5] in row 2 (DistShift1) or 5 (DistShift2),
        # goal at (width-2, 1), agent (1,1) facing right; deterministic
        # layout, max_steps = 4·width², see_through_walls=True (upstream
        # minigrid/envs/distshift.py).
        return EnvParams("distshift", 9, 7, 4 * 9 * 9, True,
                         strip_row=2 if m.group(1) == "1" else 5)
    m = re.match(r"MiniGrid-RedBlueDoors-(\d+)x(\d+)(-v\d+)?$", env_id)
    if m:
        # RedBlueDoorEnv(size): 2size×size grid; a size×size room in the
        # middle (wall_rect(size//2, 0, size, size)) with a red door at a
        # random y on its left wall and a blue door on its right wall;
        # agent placed randomly inside the room. Success = opening the
        # blue door while the red door is already open (upstream
        # redbluedoors.py step()); max_steps = 20·size² (registered
        # 6x6 and 8x8).
        size = int(m.group(1))
        assert size == int(m.group(2)), "only square RedBlueDoors rooms"
        return EnvParams("redblue", 2 * size, size, 20 * size * size, False,
                         success="red_then_blue")
    m = re.match(r"MiniGrid-MultiRoom-N(\d+)(?:-S(\d+))?(-v\d+)?$", env_id)
    if m:
        # MultiRoomEnv(minNumRooms=n, maxNumRooms=n, maxRoomSize=s or 10):
        # 25×25 grid, max_steps = maxNumRooms·20 (upstream multiroom.py;
        # registered ids N2-S4, N4-S5, N6).
        n = int(m.group(1))
        s = int(m.group(2)) if m.group(2) else 10
        return EnvParams(
            "multiroom", 25, 25, n * 20, False,
            min_rooms=n, max_rooms=n, max_room_size=s,
        )
    m = re.match(r"MiniGrid-(Simple|Lava)CrossingS(\d+)N(\d+)(-v\d+)?$", env_id)
    if m:
        # CrossingEnv(size, num_crossings, obstacle_type=Wall|Lava):
        # max_steps = 4·size² (upstream crossing.py; registered sizes
        # S9N{1,2,3} and S11N5).
        size = int(m.group(2))
        return EnvParams(
            "crossing", size, size, 4 * size * size, False,
            num_crossings=int(m.group(3)),
            obstacle=WALL if m.group(1) == "Simple" else LAVA,
        )
    m = re.match(r"MiniGrid-Dynamic-Obstacles(-Random)?-(\d+)x(\d+)(-v\d+)?$",
                 env_id)
    if m:
        # DynamicObstaclesEnv(size, agent_start_pos=(1,1)|None,
        # n_obstacles=size//2): size//2 moving balls; restricted 3-action
        # space (left/right/forward); max_steps = 4·size²,
        # see_through_walls=True (upstream dynamicobstacles.py; registered
        # [Random-]{5x5,6x6,8x8,16x16}).
        size = int(m.group(2))
        assert size == int(m.group(3)), "only square grids are supported"
        return EnvParams(
            "dynobs", size, size, 4 * size * size, True,
            random_start=m.group(1) is not None,
            n_obstacles=size // 2, num_actions=3,
        )
    m = re.match(r"MiniGrid-KeyCorridorS(\d+)R(\d+)(-v\d+)?$", env_id)
    if m:
        # KeyCorridorEnv(room_size=s, num_rows=r): RoomGrid(3 columns ×
        # r rows of s×s rooms) → ((s-1)·3+1) × ((s-1)·r+1) grid; the
        # middle column is opened into a corridor, a LOCKED random-color
        # door hides a ball in a random right-column room, the matching
        # key sits in a random left-column room, the agent starts in the
        # middle, and connect_all() adds doors until every room is
        # reachable. Success = picking the ball up
        # (upstream minigrid/envs/keycorridor.py; max_steps = 30·s²;
        # registered S3R{1,2,3}, S{4,5,6}R3).
        s, r = int(m.group(1)), int(m.group(2))
        return EnvParams(
            "keycorridor", (s - 1) * 3 + 1, (s - 1) * r + 1, 30 * s * s,
            False, min_rooms=r, max_room_size=s, success="pickup_ball",
        )
    if re.match(r"MiniGrid-Unlock(-v\d+)?$", env_id):
        # UnlockEnv: RoomGrid(room_size=6, rows=1, cols=2) → 11×6 grid,
        # locked random-color door on the dividing wall, matching key and
        # agent placed in the left room; success = toggling the door open
        # (upstream unlock.py; max_steps = 8·room_size²).
        return EnvParams("unlock", 11, 6, 8 * 6 * 6, False,
                         success="open_door")
    if re.match(r"MiniGrid-UnlockPickup(-v\d+)?$", env_id):
        # UnlockPickupEnv: the Unlock layout plus a random-color box in
        # the right room; success = picking the box up (upstream
        # unlockpickup.py; max_steps = 8·room_size²).
        return EnvParams("unlock", 11, 6, 8 * 6 * 6, False,
                         success="pickup_box")
    m = re.match(r"MiniGrid-ObstructedMaze-1Dl(h?)(b?)(-v\d+)?$", env_id)
    if m:
        # ObstructedMaze_1Dl{,h,hb}: RoomGrid(room_size=6, 1×2 rooms) —
        # the Unlock layout with the target BLUE ball in the right room;
        # "h" hides the key inside a box (toggle reveals it), "b" blocks
        # the locked door with a non-blue ball (the -v1 bugfix colors —
        # v0's blue blocker was indistinguishable from the target).
        # Success = picking the blue ball up; max_steps =
        # 4·num_rooms_visited·room_size² = 288 (upstream
        # minigrid/envs/obstructedmaze.py).
        return EnvParams(
            "unlock", 11, 6, 4 * 2 * 36, False, success="pickup_ball",
            target_color=BLUE, key_in_box=m.group(1) == "h",
            blocked_door=m.group(2) == "b",
        )
    m = re.match(r"MiniGrid-ObstructedMaze-2Dl(h?)(b?)(-v\d+)?$", env_id)
    if m:
        # ObstructedMaze_2Dl{,h,hb}: the Full maze restricted to one
        # quarter with the agent starting in the side room (2, 1) —
        # upstream ObstructedMaze_Full((2, 1), key_in_box, blocked,
        # num_quarters=1, num_rooms_visited=4); max_steps =
        # 4·num_rooms_visited·room_size² = 576 (upstream
        # minigrid/envs/obstructedmaze.py — reconstructed).
        return EnvParams(
            "obstructedfull", 16, 16, 4 * 4 * 36, False,
            success="pickup_ball", target_color=BLUE,
            key_in_box=m.group(1) == "h", blocked_door=m.group(2) == "b",
            min_rooms=1, agent_room=(2, 1),
        )
    m = re.match(r"MiniGrid-ObstructedMaze-(1Q|2Q|Full)(-v\d+)?$", env_id)
    if m:
        # ObstructedMaze_{1Q,2Q,Full}: a 3×3 RoomGrid of 6×6 rooms; the
        # agent starts in the middle room, which opens onto
        # ``num_quarters`` side rooms; each side room has two LOCKED
        # doors toward its corners with the keys hidden in boxes and the
        # doors blocked by balls; the target BLUE ball sits in one of the
        # first ``num_quarters`` corner rooms. max_steps =
        # 4·num_rooms_visited·room_size² with num_rooms_visited
        # ∈ {1Q: 5, 2Q: 11, Full: 25} (upstream obstructedmaze.py —
        # reconstructed).
        q = {"1Q": 1, "2Q": 2, "Full": 4}[m.group(1)]
        visited = {"1Q": 5, "2Q": 11, "Full": 25}[m.group(1)]
        return EnvParams(
            "obstructedfull", 16, 16, 4 * visited * 36, False,
            success="pickup_ball", target_color=BLUE,
            key_in_box=True, blocked_door=True,
            min_rooms=q, agent_room=(1, 1),
        )
    if re.match(r"MiniGrid-Playground(-v\d+)?$", env_id):
        # PlaygroundEnv: 19×19 split into 3×3 rooms of 6×6, one CLOSED
        # random-color door per internal wall segment (12 doors), twelve
        # random key/ball/box objects of random colors, random agent
        # start. No goal and no reward — episodes only truncate at
        # max_steps=100 (upstream minigrid/envs/playground.py —
        # reconstructed).
        return EnvParams("playground", 19, 19, 100, False)
    if re.match(r"MiniGrid-BlockedUnlockPickup(-v\d+)?$", env_id):
        # BlockedUnlockPickupEnv: UnlockPickup plus a random-color ball
        # placed directly left of the locked door — the agent must move
        # it aside before unlocking (upstream blockedunlockpickup.py;
        # max_steps = 16·room_size²).
        return EnvParams("unlock", 11, 6, 16 * 6 * 6, False,
                         success="pickup_box", blocked_door=True)
    if re.match(r"MiniGrid-FourRooms(-v\d+)?$", env_id):
        # FourRoomsEnv: 19×19, four rooms with one random gap per shared
        # wall segment, random agent + goal, max_steps=100 (the env the
        # reference's eval configs reference, `evaluate_algorithm.py:30`).
        return EnvParams("fourrooms", 19, 19, 100, False, True)
    m = re.match(r"MiniGrid-LavaGapS(\d+)(-v\d+)?$", env_id)
    if m:
        # LavaGapEnv(size): full-height lava column at a random x with a
        # single gap; agent (1,1) facing right, goal bottom-right,
        # max_steps = 4·size², see_through_walls=False (upstream
        # minigrid lavagap.py; S5/S6/S7 are the registered sizes).
        size = int(m.group(1))
        return EnvParams("lavagap", size, size, 4 * size * size, False)
    m = re.match(r"MiniGrid-LockedRoom(-v\d+)?$", env_id)
    if m:
        # LockedRoomEnv(size=19): a central hallway flanked by 2×3 rooms;
        # one room is locked and holds the goal, the key (of the locked
        # door's color) lies in another room; the agent starts in the
        # hallway. max_steps = 10·size, see_through_walls=False (upstream
        # minigrid/envs/lockedroom.py — reconstructed; only size 19 is
        # registered).
        return EnvParams("lockedroom", 19, 19, 10 * 19, False)
    m = re.match(r"MiniGrid-MemoryS(\d+)(Random)?(-v\d+)?$", env_id)
    if m:
        # MemoryEnv(size): the agent starts in a small room holding one
        # green key-or-ball, walks a hallway, and must step onto the cell
        # in front of the matching object at the fork (wrong side
        # terminates with 0). Success/failure cells live in
        # EnvState.target. max_steps = 5·size², see_through_walls=False
        # (upstream minigrid/envs/memory.py — reconstructed). Registered:
        # S7, S9, S11, S13, S13Random, S17Random.
        size = int(m.group(1))
        assert size % 2 == 1, "Memory needs an odd size"
        assert size >= 7, "Memory needs size >= 7"
        return EnvParams("memory", size, size, 5 * size * size, False,
                         random_length=bool(m.group(2)), success="memory")
    m = re.match(r"MiniGrid-GoToDoor-(\d+)x(\d+)(-v\d+)?$", env_id)
    if m:
        # GoToDoorEnv(size): the room's width/height are re-randomized per
        # episode in [5, size]; four CLOSED doors of distinct colors, one
        # per wall; the mission names one of them and the ``done`` action
        # next to it earns the time-scaled reward; any toggle ends the
        # episode ("don't let the agent open the doors"). max_steps =
        # 4·size², see_through_walls=True (upstream minigrid/envs/
        # gotodoor.py — reconstructed; the package is not in this image).
        # Registered sizes: 5x5, 6x6, 8x8.
        size = int(m.group(1))
        assert size == int(m.group(2)), "only square GoToDoor grids"
        assert size >= 5, "GoToDoor needs size >= 5"
        return EnvParams("gotodoor", size, size, 4 * size * size, True,
                         success="goto_door")
    m = re.match(r"MiniGrid-Fetch-(\d+)x(\d+)-N(\d+)(-v\d+)?$", env_id)
    if m:
        # FetchEnv(size, numObjs): numObjs keys/balls of random colors
        # (duplicate type+color pairs allowed, upstream fetch.py); the
        # mission names one (type, color) and picking ANY object ends the
        # episode — time-scaled reward iff it matches. max_steps = 5·size²,
        # see_through_walls=True (reconstructed). Registered: 5x5-N2,
        # 6x6-N2, 8x8-N3.
        size = int(m.group(1))
        assert size == int(m.group(2)), "only square Fetch grids"
        return EnvParams("fetch", size, size, 5 * size * size, True,
                         success="fetch", num_objs=int(m.group(3)))
    m = re.match(r"MiniGrid-GoToObject-(\d+)x(\d+)-N(\d+)(-v\d+)?$", env_id)
    if m:
        # GoToObjectEnv(size, numObjs): numObjs distinct (type, color)
        # key/ball/box objects; the ``done`` action within Chebyshev
        # distance 1 of the mission's target earns the time-scaled reward
        # and ends the episode either way. max_steps = 5·size²,
        # see_through_walls=True (upstream gotoobject.py — reconstructed).
        # Registered: 6x6-N2, 8x8-N2.
        size = int(m.group(1))
        assert size == int(m.group(2)), "only square GoToObject grids"
        return EnvParams("gotoobject", size, size, 5 * size * size, True,
                         success="goto_object", num_objs=int(m.group(3)))
    m = re.match(r"MiniGrid-PutNear-(\d+)x(\d+)-N(\d+)(-v\d+)?$", env_id)
    if m:
        # PutNearEnv(size, numObjs): numObjs distinct (type, color)
        # key/ball/box objects placed so no two are adjacent; the mission
        # asks to put object A near object B — dropping A within Chebyshev
        # distance 1 of B earns the time-scaled reward; any drop of a
        # carried object ends the episode, as does picking up the wrong
        # object. max_steps = 5·size (a deliberately short horizon),
        # see_through_walls=True (upstream putnear.py — reconstructed).
        # Registered: 6x6-N2, 8x8-N3.
        size = int(m.group(1))
        assert size == int(m.group(2)), "only square PutNear grids"
        return EnvParams("putnear", size, size, 5 * size, True,
                         success="putnear", num_objs=int(m.group(3)))
    m = re.match(r"BabyAI-GoToRedBall(Grey|NoDists)?(-v\d+)?$", env_id)
    if m:
        # BabyAI GoToRedBall{,Grey,NoDists} (upstream
        # minigrid/envs/babyai/goto.py — reconstructed): one 8×8 room
        # (RoomGridLevel num_rows=num_cols=1, room_size=8, max_steps =
        # 8·room_size²); the agent is placed first, then a red ball, then
        # 7 distractors — random key/ball/box × 6 colors with duplicates
        # allowed (all_unique=False); the Grey variant recolors every
        # distractor grey, NoDists places none. Layouts are
        # rejection-sampled until no object is blocked
        # (check_objs_reachable). Mission: GoToInstr(red ball).
        variant = m.group(1)
        return EnvParams(
            "babyai_goto", 8, 8, 8 * 8 * 8, False,
            success="babyai_goto",
            num_objs=0 if variant == "NoDists" else 7,
            grey_dists=variant == "Grey",
            # ≥ 0 marks the fixed (BALL, RED) mission target.
            target_color=RED,
        )
    m = re.match(r"BabyAI-GoToRedBlueBall(-v\d+)?$", env_id)
    if m:
        # BabyAI GoToRedBlueBall (upstream minigrid/envs/babyai/goto.py
        # — reconstructed): one 8×8 room, 7 distractors, then a ball
        # colored red or blue (uniform); the whole layout is
        # rejection-resampled if any distractor is a red or blue ball
        # (upstream raises RejectSampling) — per-draw conditional
        # sampling is distribution-identical since the predicate
        # factorizes per distractor. Mission: GoToInstr on the ball.
        return EnvParams("babyai_goto", 8, 8, 8 * 8 * 8, False,
                         success="babyai_goto", num_objs=7, rb_target=True)
    m = re.match(r"BabyAI-OpenRedDoor(-v\d+)?$", env_id)
    if m:
        # BabyAI OpenRedDoor (upstream minigrid/envs/babyai/open.py —
        # reconstructed): RoomGrid 1 row × 2 cols of 5×5 rooms (9×5
        # grid), a red unlocked door on the shared wall at a random y,
        # agent placed in the left room; max_steps = 8·room_size².
        # Mission: OpenInstr(red door).
        return EnvParams("babyai_openred", 9, 5, 8 * 5 * 5, False,
                         success="babyai_open")
    m = re.match(r"BabyAI-OpenDoor(Color|Loc)?(Debug)?(-v\d+)?$", env_id)
    if m:
        # BabyAI OpenDoor[Color|Loc][Debug] (upstream open.py —
        # reconstructed): default 3×3 RoomGrid of 8×8 rooms (22×22); the
        # center room gets one unlocked door per wall in 4 distinct
        # colors; the agent starts inside it. The mission names the
        # target by color (the first door's color — matching exactly
        # that door) or by a location word relative to the agent's
        # start pose; unforced variants sample the mode per episode.
        # Debug = OpenInstr strict (toggling a non-matching door fails).
        return EnvParams("babyai_opendoor", 22, 22, 8 * 8 * 8, False,
                         success="babyai_open",
                         select_by=(m.group(1) or "").lower(),
                         strict=m.group(2) is not None)
    m = re.match(r"BabyAI-ActionObjDoor(-v\d+)?$", env_id)
    if m:
        # BabyAI ActionObjDoor (upstream minigrid/envs/babyai/other.py —
        # reconstructed): 3×3 RoomGrid of 7×7 rooms (19×19); the center
        # room gets 5 DISTINCT distractors (add_distractors default
        # all_unique=True) and one unlocked random-color door per wall
        # (duplicate colors allowed); agent inside. The mission picks
        # one of the 9 objects uniformly: a door gets GoToInstr or
        # OpenInstr (coin flip), an object GoToInstr or PickupInstr —
        # the per-episode verb lives in EnvState.target[0]
        # (0=goto, 1=pickup, 2=open), the (type, color) in target[1:3].
        return EnvParams("babyai_actionobj", 19, 19, 8 * 7 * 7, False,
                         success="babyai_action", num_objs=5)
    m = re.match(r"BabyAI-GoTo(Open)?(-v\d+)?$", env_id)
    if m:
        # BabyAI GoTo[Open] (upstream minigrid/envs/babyai/goto.py —
        # reconstructed): 3×3 RoomGrid of 8×8 rooms (22×22), 18
        # distractors across the maze, connect_all doors (GoToOpen opens
        # them all post-gen), reachability rejection, GoToInstr on a
        # uniform distractor. max_steps follows this module's BabyAI
        # convention (the RoomGrid default 8·room_size²).
        return EnvParams(
            "babyai_gotomaze", 22, 22, 8 * 8 * 8, False,
            success="babyai_goto", num_objs=18,
            min_rooms=3, max_rooms=3, max_room_size=8,
            doors_open=m.group(1) is not None,
        )
    m = re.match(r"BabyAI-GoToObjMaze(Open)?(?:S(\d+)(R2)?)?(-v\d+)?$",
                 env_id)
    if m:
        # BabyAI GoToObjMaze{,Open,S4R2,S4,S5,S6,S7} (upstream goto.py —
        # reconstructed): the GoTo generator with num_dists=1; S{n}
        # variants shrink the rooms to n×n (3×3 rooms except S4R2's
        # 2×2), Open opens all connect_all doors post-gen.
        S = int(m.group(2)) if m.group(2) else 8
        rows = 2 if m.group(3) else 3
        side = (S - 1) * rows + 1
        return EnvParams(
            "babyai_gotomaze", side, side, 8 * S * S, False,
            success="babyai_goto", num_objs=1,
            min_rooms=rows, max_rooms=rows, max_room_size=S,
            doors_open=m.group(1) is not None,
        )
    m = re.match(r"BabyAI-Open(-v\d+)?$", env_id)
    if m:
        # BabyAI Open (upstream minigrid/envs/babyai/open.py —
        # reconstructed): the GoTo maze generator (3×3 × 8×8 rooms, 18
        # distractors). Upstream Open.gen_mission calls
        # check_objs_reachable() right after add_distractors(18), so
        # blocked layouts are rejection-sampled — _reset_babyai_gotomaze
        # runs the same _objs_reachable rejection for this family
        # (pinned by test_babyai_maze.py::test_open_layouts_reachable).
        # The mission names the color of a uniformly drawn door — any
        # door of that color satisfies OpenInstr.
        return EnvParams(
            "babyai_gotomaze", 22, 22, 8 * 8 * 8, False,
            success="babyai_open_color", num_objs=18,
            min_rooms=3, max_rooms=3, max_room_size=8,
        )
    m = re.match(r"BabyAI-(Unblock)?Pickup(-v\d+)?$", env_id)
    if m:
        # BabyAI Pickup / UnblockPickup (upstream
        # minigrid/envs/babyai/pickup.py — reconstructed): the GoTo maze
        # generator (3×3 × 8×8 rooms) with PickupInstr on a uniform
        # distractor; Pickup places 18 distractors and requires all
        # reachable, UnblockPickup places 20 and REJECTS layouts where
        # everything is reachable (the agent must unblock something).
        unblock = m.group(1) is not None
        return EnvParams(
            "babyai_gotomaze", 22, 22, 8 * 8 * 8, False,
            success="babyai_pickup", num_objs=20 if unblock else 18,
            min_rooms=3, max_rooms=3, max_room_size=8,
            invert_reach=unblock,
        )
    m = re.match(r"BabyAI-GoToSeq(S5R2)?(-v\d+)?$", env_id)
    if m:
        # BabyAI GoToSeq[S5R2] (upstream synth.py — reconstructed):
        # LevelGen with action_kinds=["goto"], every instruction grammar
        # kind, no locked room, no location language, unblocking=False
        # (reachability rejection). S5R2 shrinks to 2×2 rooms of 5.
        small = m.group(1) is not None
        S, rows, dists = (5, 2, 7) if small else (8, 3, 18)
        side = (S - 1) * rows + 1
        return EnvParams(
            "babyai_levelgen", side, side, 8 * S * S, False,
            success="babyai_seq", num_objs=dists,
            min_rooms=rows, max_rooms=rows, max_room_size=S,
            instr_kinds="action,and,seq", action_kinds="goto",
            check_reachable=True,
        )
    m = re.match(r"BabyAI-Synth(S5R2|Loc|Seq)?(-v\d+)?$", env_id)
    if m:
        # BabyAI Synth / SynthS5R2 / SynthLoc / SynthSeq (upstream
        # synth.py — reconstructed): LevelGen over all four verbs;
        # locked_room_prob=0.5 (implicit unlock missions), Loc adds
        # location language, Seq adds and/seq grammar (with locations).
        v = m.group(1) or ""
        small = v == "S5R2"
        S, rows, dists = (5, 2, 7) if small else (8, 3, 18)
        side = (S - 1) * rows + 1
        return EnvParams(
            "babyai_levelgen", side, side, 8 * S * S, False,
            success="babyai_seq", num_objs=dists,
            min_rooms=rows, max_rooms=rows, max_room_size=S,
            locked_room_prob=0.5,
            instr_kinds="action,and,seq" if v == "Seq" else "action",
            action_kinds="goto,pickup,open,putnext",
            locations=v in ("Loc", "Seq"),
        )
    m = re.match(r"BabyAI-(Mini)?BossLevel(NoUnlock)?(-v\d+)?$", env_id)
    if m:
        # BabyAI MiniBossLevel / BossLevel / BossLevelNoUnlock (upstream
        # synth.py — reconstructed): the full LevelGen grammar with
        # location language. MiniBoss: 2×2 rooms of 5, 7 distractors,
        # locked_room_prob=0.25; Boss: 3×3 of 8, 18, 0.5; NoUnlock: no
        # locked rooms.
        mini = m.group(1) is not None
        S, rows, dists = (5, 2, 7) if mini else (8, 3, 18)
        side = (S - 1) * rows + 1
        prob = 0.25 if mini else (0.0 if m.group(2) else 0.5)
        return EnvParams(
            "babyai_levelgen", side, side, 8 * S * S, False,
            success="babyai_seq", num_objs=dists,
            min_rooms=rows, max_rooms=rows, max_room_size=S,
            locked_room_prob=prob,
            instr_kinds="action,and,seq",
            action_kinds="goto,pickup,open,putnext", locations=True,
        )
    m = re.match(r"BabyAI-Unlock(-v\d+)?$", env_id)
    if m:
        # BabyAI Unlock (upstream minigrid/envs/babyai/unlock.py —
        # reconstructed): 3×3 maze of 8×8 rooms; one random room gets a
        # LOCKED random-color door, the matching key lands in a
        # different room, connect_all (with prob 1/2 avoiding the
        # locked color so the mission door is unique), 18 distractors,
        # agent outside the locked room, reachability rejection ("no
        # unblocking"). Mission: OpenInstr(door, color).
        return EnvParams(
            "babyai_gotomaze", 22, 22, 8 * 8 * 8, False,
            success="babyai_open_color", num_objs=18,
            min_rooms=3, max_rooms=3, max_room_size=8, locked_room=True,
        )
    m = re.match(r"BabyAI-UnlockLocal(Dist)?(-v\d+)?$", env_id)
    if m:
        # BabyAI UnlockLocal[Dist] (upstream unlock.py): locked door +
        # key in the center room; Dist adds 3 distinct distractors.
        # Mission: OpenInstr(ObjDesc("door")) — type only.
        return EnvParams(
            "babyai_unlocklocal", 22, 22, 8 * 8 * 8, False,
            success="babyai_open_color",
            num_objs=3 if m.group(1) else 0,
        )
    m = re.match(r"BabyAI-KeyInBox(-v\d+)?$", env_id)
    if m:
        # BabyAI KeyInBox (upstream unlock.py): UnlockLocal with the
        # key hidden in a random-color box (toggle reveals it).
        return EnvParams(
            "babyai_unlocklocal", 22, 22, 8 * 8 * 8, False,
            success="babyai_open_color", key_in_box=True,
        )
    m = re.match(r"BabyAI-UnlockPickup(Dist)?(-v\d+)?$", env_id)
    if m:
        # BabyAI UnlockPickup[Dist] (upstream unlock.py): the
        # MiniGrid-UnlockPickup layout (two 6×6 rooms, locked door, key
        # left, box right — `_reset_unlock`); the mission is
        # PickupInstr(box type + color). Dist adds 4 distinct
        # distractors anywhere, so success must match the color
        # (babyai_pickup); the plain variant's only box makes
        # pickup_box equivalent.
        if m.group(1):
            return EnvParams("unlock", 11, 6, 8 * 6 * 6, False,
                             success="babyai_pickup", num_objs=4)
        return EnvParams("unlock", 11, 6, 8 * 6 * 6, False,
                         success="pickup_box")
    m = re.match(r"BabyAI-BlockedUnlockPickup(-v\d+)?$", env_id)
    if m:
        # BabyAI BlockedUnlockPickup = the MiniGrid id's layout
        # (upstream unlock.py subclasses the same generator).
        return EnvParams("unlock", 11, 6, 16 * 6 * 6, False,
                         success="pickup_box", blocked_door=True)
    m = re.match(r"BabyAI-UnlockToUnlock(-v\d+)?$", env_id)
    if m:
        # BabyAI UnlockToUnlock (upstream unlock.py): three 6×6 rooms,
        # two locked doors with crossed keys, ball in the far room;
        # mission PickupInstr(ObjDesc("ball")). max_steps = 30·6².
        return EnvParams("babyai_u2u", 16, 6, 30 * 6 * 6, False,
                         success="babyai_pickup")
    m = re.match(r"BabyAI-GoToImpUnlock(-v\d+)?$", env_id)
    if m:
        # BabyAI GoToImpUnlock (upstream unlock.py): the Unlock maze
        # with 2 distractors per non-locked room and the GoToInstr
        # target object inside the locked room — the agent must infer
        # the unlock ("no unblocking").
        return EnvParams(
            "babyai_gotomaze", 22, 22, 8 * 8 * 8, False,
            success="babyai_goto", num_objs=16,
            min_rooms=3, max_rooms=3, max_room_size=8,
            locked_room=True, target_in_locked=True, dists_per_room=True,
        )
    m = re.match(r"BabyAI-OneRoomS(\d+)(-v\d+)?$", env_id)
    if m:
        # BabyAI OneRoomS{8,12,16,20} (upstream
        # minigrid/envs/babyai/other.py — reconstructed): one s×s room
        # holding a single random-color ball; mission
        # PickupInstr(ObjDesc("ball")) — type only.
        size = int(m.group(1))
        return EnvParams("babyai_goto", size, size, 8 * size * size, False,
                         success="babyai_pickup", num_objs=0,
                         type_only=True)
    m = re.match(r"BabyAI-FindObjS(\d+)(-v\d+)?$", env_id)
    if m:
        # BabyAI FindObjS{5,6,7} (upstream other.py — reconstructed):
        # 3×3 RoomGrid of s×s rooms; ONE random object in a uniformly
        # random room, agent placed in the middle room (place_agent(1,
        # 1)), connect_all; mission PickupInstr on the object's TYPE
        # ("requires potentially exhaustive exploration"). max_steps
        # follows this module's RoomGrid default 8·s².
        s = int(m.group(1))
        side = (s - 1) * 3 + 1
        return EnvParams(
            "babyai_gotomaze", side, side, 8 * s * s, False,
            success="babyai_pickup", num_objs=1,
            min_rooms=3, max_rooms=3, max_room_size=s,
            fixed_agent_room=True, agent_room=(1, 1), type_only=True,
        )
    m = re.match(r"BabyAI-PickupAbove(-v\d+)?$", env_id)
    if m:
        # BabyAI PickupAbove (upstream pickup.py — reconstructed): 3×3
        # RoomGrid of 8×8 rooms; a random object in the room ABOVE the
        # middle (add_object(1, 0)), a guaranteed door on the middle
        # room's top wall (add_door(1, 1, 3)), agent in the middle,
        # connect_all; mission PickupInstr on the object's type
        # ("requires to use the compass").
        return EnvParams(
            "babyai_gotomaze", 22, 22, 8 * 8 * 8, False,
            success="babyai_pickup", num_objs=1,
            min_rooms=3, max_rooms=3, max_room_size=8,
            fixed_agent_room=True, agent_room=(1, 1), obj_room=(1, 0),
            predoor=(1, 1, 3), type_only=True,
        )
    m = re.match(r"BabyAI-GoToDoor(-v\d+)?$", env_id)
    if m:
        # BabyAI GoToDoor (upstream goto.py — reconstructed): 3×3
        # RoomGrid of 7×7 rooms; the center room gets one door per wall
        # in independent random colors (duplicates allowed); mission
        # GoToInstr("door", color of a uniform door) — any door of that
        # color matches.
        return EnvParams("babyai_objdoor", 19, 19, 8 * 7 * 7, False,
                         success="babyai_goto", num_objs=0,
                         max_room_size=7)
    m = re.match(r"BabyAI-GoToObjDoor(-v\d+)?$", env_id)
    if m:
        # BabyAI GoToObjDoor (upstream goto.py — reconstructed): 6×6
        # center room with 8 distractors (duplicates allowed) plus one
        # random-color door per wall; mission GoToInstr on a uniform
        # draw over all 12.
        return EnvParams("babyai_objdoor", 16, 16, 8 * 6 * 6, False,
                         success="babyai_goto", num_objs=8,
                         max_room_size=6)
    m = re.match(r"BabyAI-PutNextS(\d+)N(\d+)(Carrying)?(-v\d+)?$", env_id)
    if m:
        # BabyAI PutNextS{s}N{n}[Carrying] (upstream putnext.py —
        # reconstructed): two s×s rooms with the dividing wall removed,
        # n DISTINCT objects per side; move a uniform left object next
        # to a uniform right object (pair coin-flipped); Carrying
        # variants start with the move object in hand.
        s, n = int(m.group(1)), int(m.group(2))
        return EnvParams(
            "babyai_putnext2", 2 * s - 1, s, 8 * s * s, False,
            success="babyai_putnext", num_objs=n, max_room_size=s,
            start_carrying=m.group(3) is not None,
        )
    m = re.match(r"BabyAI-MoveTwoAcrossS(\d+)N(\d+)(-v\d+)?$", env_id)
    if m:
        # BabyAI MoveTwoAcrossS{5N2,8N9} (upstream other.py —
        # reconstructed): the PutNext layout; BeforeInstr of two
        # PutNextInstr — a left object next to a right one, THEN a
        # right object next to a left one.
        s, n = int(m.group(1)), int(m.group(2))
        return EnvParams(
            "babyai_putnext2", 2 * s - 1, s, 16 * s * s, False,
            success="babyai_seq", num_objs=n, max_room_size=s,
        )
    m = re.match(r"BabyAI-Open(RedBlue|Two)Doors(Debug)?(-v\d+)?$", env_id)
    if m:
        # BabyAI OpenTwoDoors / OpenRedBlueDoors[Debug] (upstream
        # open.py — reconstructed): 6×6 center room, door 1 west / door
        # 2 east; BeforeInstr(OpenInstr(d1, strict=Debug),
        # OpenInstr(d2)). RedBlue forces red-then-blue.
        rb = m.group(1) == "RedBlue"
        return EnvParams(
            "babyai_twodoors", 16, 16, 20 * 6 * 6, False,
            success="babyai_seq", comp="before",
            first_color=RED if rb else -1,
            second_color=BLUE if rb else -1,
            strict=m.group(2) is not None,
        )
    m = re.match(r"BabyAI-OpenDoorsOrderN(\d+)(Debug)?(-v\d+)?$", env_id)
    if m:
        # BabyAI OpenDoorsOrderN{2,4}[Debug] (upstream open.py —
        # reconstructed): N distinct-color doors on distinct walls of
        # the 6×6 center room; a uniform per-episode mode over {open d1;
        # open d1 then d2; open d1 after you open d2}.
        return EnvParams(
            "babyai_twodoors", 16, 16, 20 * 6 * 6, False,
            success="babyai_seq", num_objs=int(m.group(1)),
            strict=m.group(2) is not None,
        )
    m = re.match(r"BabyAI-PickupLoc(-v\d+)?$", env_id)
    if m:
        # BabyAI PickupLoc (upstream pickup.py — LevelGen single room,
        # 8 distractors, location language): PickupInstr over a
        # rejection-sampled ObjDesc(type, color?, loc?) fixed against
        # the agent's start pose.
        return EnvParams("babyai_pickuploc", 8, 8, 8 * 8 * 8, False,
                         success="babyai_seq", num_objs=8)
    m = re.match(r"BabyAI-GoToObj(?:S(\d+))?(-v\d+)?$", env_id)
    if m:
        # BabyAI GoToObj[S{4,6}] (upstream goto.py): one room with a
        # single random object (uniform key/ball/box × 6 colors), mission
        # GoToInstr on it. Upstream skips check_objs_reachable here (a
        # lone object in an open room is never blocked); running it is
        # distribution-identical. Registered room sizes 8 (default), 4, 6.
        size = int(m.group(1)) if m.group(1) else 8
        return EnvParams("babyai_goto", size, size, 8 * size * size, False,
                         success="babyai_goto", num_objs=1)
    m = re.match(r"BabyAI-GoToLocal(?:S(\d+)N(\d+))?(-v\d+)?$", env_id)
    if m:
        # BabyAI GoToLocal[S{s}N{n}] (upstream goto.py): one s×s room,
        # n distractors (duplicates allowed), target drawn uniformly from
        # them; reachability rejection-sampled. Default room_size=8,
        # num_dists=8; registered variants S5N2, S6N{2,3,4}, S7N{4,5},
        # S8N{2..7}.
        size = int(m.group(1)) if m.group(1) else 8
        n = int(m.group(2)) if m.group(2) else 8
        return EnvParams("babyai_goto", size, size, 8 * size * size, False,
                         success="babyai_goto", num_objs=n)
    m = re.match(r"BabyAI-PutNextLocal(?:S(\d+)N(\d+))?(-v\d+)?$", env_id)
    if m:
        # BabyAI PutNextLocal[SsNn] (upstream
        # minigrid/envs/babyai/putnext.py): one s×s room, n DISTINCT
        # objects, mission "put A next to B" for an ordered random pair;
        # success on a drop action once A sits cardinally adjacent to B.
        # Default room_size=8, num_objs=8; registered S5N3, S6N4.
        size = int(m.group(1)) if m.group(1) else 8
        n = int(m.group(2)) if m.group(2) else 8
        return EnvParams("babyai_putnext", size, size, 8 * size * size,
                         False, success="babyai_putnext", num_objs=n)
    m = re.match(r"BabyAI-PickupDist(Debug)?(-v\d+)?$", env_id)
    if m:
        # BabyAI PickupDist[Debug] (upstream
        # minigrid/envs/babyai/pickup.py): one 7×7 room, 5 distinct
        # objects, mission restricted to type/color/both; Debug = strict
        # PickupInstr (wrong pickup fails). No reachability check
        # upstream for this level.
        return EnvParams("babyai_pickup", 7, 7, 8 * 7 * 7, False,
                         success="babyai_pickup", num_objs=5,
                         strict=m.group(1) is not None)
    m = re.match(r"MiniGrid-(Empty|DoorKey)(-Random)?-(\d+)x(\d+)(-v\d+)?$", env_id)
    if not m:
        raise ValueError(
            f"unsupported MiniGrid env id: {env_id!r}. Supported families: "
            "MiniGrid-Empty[-Random]-NxN, MiniGrid-DoorKey-NxN, "
            "MiniGrid-FourRooms, MiniGrid-LavaGapSn, MiniGrid-MultiRoom-Nn[-Ss], "
            "MiniGrid-SimpleCrossingSsNn, MiniGrid-LavaCrossingSsNn, "
            "MiniGrid-Unlock, MiniGrid-UnlockPickup, "
            "MiniGrid-BlockedUnlockPickup, MiniGrid-ObstructedMaze-1Dl{,h,hb}, "
            "MiniGrid-ObstructedMaze-2Dl{,h,hb}, "
            "MiniGrid-ObstructedMaze-{1Q,2Q,Full}, MiniGrid-Playground, "
            "MiniGrid-KeyCorridorSsRr, "
            "MiniGrid-Dynamic-Obstacles[-Random]-NxN, MiniGrid-DistShift{1,2}, "
            "MiniGrid-RedBlueDoors-NxN, MiniGrid-LockedRoom, "
            "MiniGrid-MemoryS{n}[Random], MiniGrid-GoToDoor-NxN, "
            "MiniGrid-Fetch-NxN-Nk, MiniGrid-GoToObject-NxN-Nk, "
            "MiniGrid-PutNear-NxN-Nk, BabyAI-GoToRedBall{,Grey,NoDists}, "
            "BabyAI-GoToRedBlueBall, BabyAI-GoToObj[Ss], "
            "BabyAI-GoToLocal[SsNn], BabyAI-PutNextLocal[SsNn], "
            "BabyAI-PickupDist[Debug], BabyAI-OpenRedDoor, "
            "BabyAI-OpenDoor[Color|Loc][Debug], BabyAI-ActionObjDoor, "
            "BabyAI-GoTo[Open], BabyAI-GoToObjMaze[Open|S4R2|S4|S5|S6|S7], "
            "BabyAI-Pickup, BabyAI-UnblockPickup, BabyAI-Open "
            "(each with an optional -vK suffix)."
        )
    kind = m.group(1).lower()
    random_start = m.group(2) is not None
    size = int(m.group(3))
    assert size == int(m.group(4)), "only square grids are supported"
    if kind == "empty":
        # EmptyEnv: max_steps = 4 * size**2, see_through_walls=True.
        return EnvParams("empty", size, size, 4 * size * size, True, random_start)
    else:
        # DoorKeyEnv: max_steps = 10 * size**2, see_through_walls=False.
        return EnvParams("doorkey", size, size, 10 * size * size, False)


# ---------------------------------------------------------------------------
# Grid generation / reset
# ---------------------------------------------------------------------------


def _base_grid(params: EnvParams, goal: bool = True) -> jax.Array:
    """Bordered empty grid, optionally with the goal in the bottom-right
    interior cell."""
    w, h = params.width, params.height
    grid = np.zeros((w, h, 3), dtype=np.int8)
    grid[..., 0] = EMPTY
    grid[0, :, :] = [WALL, GREY, 0]
    grid[w - 1, :, :] = [WALL, GREY, 0]
    grid[:, 0, :] = [WALL, GREY, 0]
    grid[:, h - 1, :] = [WALL, GREY, 0]
    if goal:
        grid[w - 2, h - 2, :] = [GOAL, GREEN, 0]
    return jnp.asarray(grid)


def _sample_free_cell(key: jax.Array, free_mask: jax.Array) -> jax.Array:
    """Uniformly sample one cell among ``free_mask`` (== MiniGrid's
    rejection-sampling distribution, expressed as a single categorical)."""
    logits = jnp.where(free_mask.reshape(-1), 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits)
    w, h = free_mask.shape
    return jnp.stack([idx // h, idx % h]).astype(jnp.int32)


def _reset_empty(params: EnvParams, key: jax.Array) -> EnvState:
    grid = _base_grid(params)
    if params.random_start:
        k_pos, k_dir, k_next = jax.random.split(key, 3)
        free = grid[..., 0] == EMPTY
        pos = _sample_free_cell(k_pos, free)
        agent_dir = jax.random.randint(k_dir, (), 0, 4)
    else:
        pos = jnp.array([1, 1], dtype=jnp.int32)
        agent_dir = jnp.int32(0)
        k_next = key
    return EnvState(
        grid=grid,
        agent_pos=pos,
        agent_dir=jnp.int32(agent_dir),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_doorkey(params: EnvParams, key: jax.Array) -> EnvState:
    w, h = params.width, params.height
    k_split, k_agent, k_dir, k_door, k_key, k_next = jax.random.split(key, 6)
    grid = _base_grid(params)

    # Splitting wall column: rand in [2, width-3].
    split = jax.random.randint(k_split, (), 2, w - 2)
    xs = jnp.arange(w).reshape(w, 1)
    wall_col = xs == split
    grid = jnp.where(
        wall_col[..., None],
        jnp.asarray([WALL, GREY, 0], dtype=jnp.int8),
        grid,
    )

    # Agent: uniform over empty cells strictly left of the wall.
    ys = jnp.arange(h).reshape(1, h)
    left_free = (grid[..., 0] == EMPTY) & (xs < split)
    agent_pos = _sample_free_cell(k_agent, left_free)
    agent_dir = jax.random.randint(k_dir, (), 0, 4)

    # Locked yellow door in the wall; row sampled in [1, width-3]
    # (MiniGrid's DoorKey uses `width` here — replicated for parity).
    door_y = jax.random.randint(k_door, (), 1, w - 2)
    grid = grid.at[split, door_y].set(jnp.asarray([DOOR, YELLOW, LOCKED], dtype=jnp.int8))

    # Yellow key: empty cell left of the wall, not the agent's cell.
    key_free = (
        (grid[..., 0] == EMPTY)
        & (xs < split)
        & ~((xs == agent_pos[0]) & (ys == agent_pos[1]))
    )
    key_pos = _sample_free_cell(k_key, key_free)
    grid = grid.at[key_pos[0], key_pos[1]].set(
        jnp.asarray([KEY, YELLOW, 0], dtype=jnp.int8)
    )

    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jnp.int32(agent_dir),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_fourrooms(params: EnvParams, key: jax.Array) -> EnvState:
    """FourRooms: central cross walls with one gap per half-segment,
    random goal cell, random agent position/direction."""
    w, h = params.width, params.height
    mx, my = w // 2, h // 2
    k_g1, k_g2, k_g3, k_g4, k_goal, k_agent, k_dir, k_next = jax.random.split(key, 8)
    grid = _base_grid(params, goal=False)

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)
    wall = jnp.asarray([WALL, GREY, 0], dtype=jnp.int8)
    cross = (xs == mx) | (ys == my)
    grid = jnp.where(cross[..., None], wall, grid)

    # One gap per half of each central wall (MiniGrid randomizes the
    # opening position within each room-to-room segment).
    gap_y_top = jax.random.randint(k_g1, (), 1, my)            # (mx, y) upper
    gap_y_bot = jax.random.randint(k_g2, (), my + 1, h - 1)    # (mx, y) lower
    gap_x_left = jax.random.randint(k_g3, (), 1, mx)           # (x, my) left
    gap_x_right = jax.random.randint(k_g4, (), mx + 1, w - 1)  # (x, my) right
    empty_cell = jnp.asarray([EMPTY, 0, 0], dtype=jnp.int8)
    grid = grid.at[mx, gap_y_top].set(empty_cell)
    grid = grid.at[mx, gap_y_bot].set(empty_cell)
    grid = grid.at[gap_x_left, my].set(empty_cell)
    grid = grid.at[gap_x_right, my].set(empty_cell)

    free = grid[..., 0] == EMPTY
    goal_pos = _sample_free_cell(k_goal, free)
    grid = grid.at[goal_pos[0], goal_pos[1]].set(
        jnp.asarray([GOAL, GREEN, 0], dtype=jnp.int8)
    )
    agent_free = free & ~(
        (xs == goal_pos[0]) & (ys == goal_pos[1])
    )
    agent_pos = _sample_free_cell(k_agent, agent_free)
    agent_dir = jax.random.randint(k_dir, (), 0, 4)

    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jnp.int32(agent_dir),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_lavagap(params: EnvParams, key: jax.Array) -> EnvState:
    """LavaGap: vertical lava strip spanning rows 1..h-2 at a random
    column x ∈ [2, w-3], with one empty gap at a random row y ∈ [1, h-2];
    agent fixed at (1,1) facing right, goal at (w-2, h-2) (upstream
    minigrid `lavagap.py:_gen_grid`)."""
    w, h = params.width, params.height
    k_x, k_y, k_next = jax.random.split(key, 3)
    grid = _base_grid(params)  # border walls + goal bottom-right

    gap_x = jax.random.randint(k_x, (), 2, w - 2)
    gap_y = jax.random.randint(k_y, (), 1, h - 1)
    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)
    lava_col = (xs == gap_x) & (ys >= 1) & (ys <= h - 2)
    grid = jnp.where(
        lava_col[..., None],
        jnp.asarray([LAVA, RED, 0], dtype=jnp.int8),
        grid,
    )
    grid = grid.at[gap_x, gap_y].set(jnp.asarray([EMPTY, 0, 0], dtype=jnp.int8))

    return EnvState(
        grid=grid,
        agent_pos=jnp.array([1, 1], dtype=jnp.int32),
        agent_dir=jnp.int32(0),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _multiroom_trial(params: EnvParams, key: jax.Array):
    """One chain-placement attempt of the MultiRoom generator.

    Mirrors upstream ``MultiRoomEnv._placeRoom`` (minigrid multiroom.py):
    despite its recursive shape, the upstream code returns True whenever a
    room was appended (deeper failures never unwind), so it is exactly a
    greedy chain — each next room gets up to 8 (exit-door, size, offset)
    proposals checked for bounds (the asymmetric ``> width`` / ``>= height``
    quirk included) and overlap against all rooms but the immediately
    previous one (``roomList[:-1]``). Returns (count, rooms [Nmax,4] as
    (topX, topY, sizeX, sizeY), entry_walls [Nmax], doors [Nmax,2]).
    """
    w, h = params.width, params.height
    n_max = params.max_rooms
    s_max = params.max_room_size
    k_entry, k_sz, key = jax.random.split(key, 3)
    entry = jax.random.randint(k_entry, (2,), 0, w - 2)
    k_sx, k_sy = jax.random.split(k_sz)
    sx = jax.random.randint(k_sx, (), 4, s_max + 1)
    sy = jax.random.randint(k_sy, (), 4, s_max + 1)
    ok0 = (entry[0] + sx <= w) & (entry[1] + sy < h)
    rooms = jnp.zeros((n_max, 4), jnp.int32)
    rooms = rooms.at[0].set(jnp.stack([entry[0], entry[1], sx, sy]))
    walls = jnp.zeros((n_max,), jnp.int32).at[0].set(2)  # entryDoorWall=2
    doors = jnp.zeros((n_max, 2), jnp.int32).at[0].set(entry)
    count = jnp.where(ok0, 1, 0).astype(jnp.int32)

    def attempt(carry, akey):
        rooms, walls, doors, count, placed, i = carry
        prev = rooms[i - 1]
        ptx, pty, psx, psy = prev[0], prev[1], prev[2], prev[3]
        prev_wall = walls[i - 1]
        k_wall, k_dx, k_dy, k_sx, k_sy, k_tx, k_ty = jax.random.split(akey, 7)
        # exit wall: uniform over sorted({0,1,2,3} - {entry wall}).
        r = jax.random.randint(k_wall, (), 0, 3)
        exit_wall = r + (r >= prev_wall).astype(jnp.int32)
        next_wall = (exit_wall + 2) % 4
        # exit door on the chosen wall of the previous room.
        dx = ptx + jax.random.randint(k_dx, (), 1, psx - 1)
        dy = pty + jax.random.randint(k_dy, (), 1, psy - 1)
        ex = jnp.select(
            [exit_wall == 0, exit_wall == 1, exit_wall == 2, exit_wall == 3],
            [ptx + psx - 1, dx, ptx, dx],
        )
        ey = jnp.select(
            [exit_wall == 0, exit_wall == 1, exit_wall == 2, exit_wall == 3],
            [dy, pty + psy - 1, dy, pty],
        )
        # next room size + top-left per its entry wall (upstream ranges:
        # _rand_int(c - size + 2, c) → [c-size+2, c-1]).
        nsx = jax.random.randint(k_sx, (), 4, s_max + 1)
        nsy = jax.random.randint(k_sy, (), 4, s_max + 1)
        rand_tx = jax.random.randint(k_tx, (), ex - nsx + 2, ex)
        rand_ty = jax.random.randint(k_ty, (), ey - nsy + 2, ey)
        ntx = jnp.select(
            [next_wall == 0, next_wall == 1, next_wall == 2, next_wall == 3],
            [ex - nsx + 1, rand_tx, ex, rand_tx],
        )
        nty = jnp.select(
            [next_wall == 0, next_wall == 1, next_wall == 2, next_wall == 3],
            [rand_ty, ey - nsy + 1, rand_ty, ey],
        )
        ok = (ntx >= 0) & (nty >= 0) & (ntx + nsx <= w) & (nty + nsy < h)
        # overlap vs all rooms but the previous (asymmetric < / <= kept).
        others = jnp.arange(n_max) < (i - 1)
        otx, oty, osx, osy = rooms[:, 0], rooms[:, 1], rooms[:, 2], rooms[:, 3]
        non_overlap = (
            (ntx + nsx < otx) | (otx + osx <= ntx)
            | (nty + nsy < oty) | (oty + osy <= nty)
        )
        ok = ok & jnp.all(non_overlap | ~others)
        commit = ok & ~placed & (count == i)
        rooms = jnp.where(
            commit, rooms.at[i].set(jnp.stack([ntx, nty, nsx, nsy])), rooms
        )
        walls = jnp.where(commit, walls.at[i].set(next_wall), walls)
        doors = jnp.where(commit, doors.at[i].set(jnp.stack([ex, ey])), doors)
        count = jnp.where(commit, i + 1, count)
        return (rooms, walls, doors, count, placed | ok, i), None

    def place(carry, inp):
        rooms, walls, doors, count = carry
        i, pkey = inp
        akeys = jax.random.split(pkey, 8)
        (rooms, walls, doors, count, _, _), _ = jax.lax.scan(
            attempt, (rooms, walls, doors, count, jnp.bool_(False), i), akeys
        )
        return (rooms, walls, doors, count), None

    if n_max > 1:
        pkeys = jax.random.split(key, n_max - 1)
        (rooms, walls, doors, count), _ = jax.lax.scan(
            place, (rooms, walls, doors, count),
            (jnp.arange(1, n_max), pkeys),
        )
    return count, rooms, walls, doors


def _reset_multiroom(params: EnvParams, key: jax.Array) -> EnvState:
    """MultiRoom-N{n}[-S{s}]: a chain of connected rooms with colored doors
    (upstream minigrid multiroom.py; 25×25 grid, no outer border — the
    rooms' own walls enclose the agent). The keep-best retry loop mirrors
    upstream's ``while len(roomList) < numRooms``; the RNG stream differs,
    as any reimplementation's must."""
    w, h = params.width, params.height
    n_max = params.max_rooms

    key, k_doors, k_agent, k_dir, k_goal, k_next = jax.random.split(key, 6)

    def cond(c):
        best_count, _, _, _, trials, _ = c
        return (best_count < n_max) & (trials < 64)

    def body(c):
        best_count, best_rooms, best_walls, best_doors, trials, key = c
        key, k_trial = jax.random.split(key)
        count, rooms, walls, doors = _multiroom_trial(params, k_trial)
        better = count > best_count
        return (
            jnp.where(better, count, best_count),
            jnp.where(better, rooms, best_rooms),
            jnp.where(better, walls, best_walls),
            jnp.where(better, doors, best_doors),
            trials + 1,
            key,
        )

    init = (
        jnp.int32(0),
        jnp.zeros((n_max, 4), jnp.int32),
        jnp.zeros((n_max,), jnp.int32),
        jnp.zeros((n_max, 2), jnp.int32),
        jnp.int32(0),
        key,
    )
    count, rooms, _, doors, _, _ = jax.lax.while_loop(cond, body, init)

    # Render: empty grid (no border), room wall rectangles in placement
    # order, each room's entry door set right after its walls (upstream
    # interleaves exactly so).
    grid = jnp.zeros((w, h, 3), jnp.int8).at[..., 0].set(EMPTY)
    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)
    wall_cell = jnp.asarray([WALL, GREY, 0], dtype=jnp.int8)
    door_keys = jax.random.split(k_doors, max(n_max, 2))
    prev_color = jnp.int32(-1)
    for i in range(n_max):
        tx, ty = rooms[i, 0], rooms[i, 1]
        sx, sy = rooms[i, 2], rooms[i, 3]
        inside = (xs >= tx) & (xs < tx + sx) & (ys >= ty) & (ys < ty + sy)
        border = inside & (
            (xs == tx) | (xs == tx + sx - 1) | (ys == ty) | (ys == ty + sy - 1)
        )
        valid = i < count
        grid = jnp.where((border & valid)[..., None], wall_cell, grid)
        if i > 0:
            # door color ≠ previous door's color (uniform over the rest).
            if i == 1:
                c = jax.random.randint(door_keys[i], (), 0, 6)
            else:
                c = jax.random.randint(door_keys[i], (), 0, 5)
                c = c + (c >= prev_color).astype(jnp.int32)
            dcell = jnp.stack(
                [jnp.int8(DOOR), c.astype(jnp.int8), jnp.int8(CLOSED)]
            )
            grid = jnp.where(valid, grid.at[doors[i, 0], doors[i, 1]].set(dcell), grid)
            prev_color = c

    # Agent: uniform over empty cells of the first room; goal: uniform over
    # empty cells of the last room, not the agent's cell (upstream
    # place_agent then place_obj(Goal) order).
    first = rooms[0]
    in_first = (
        (xs >= first[0]) & (xs < first[0] + first[2])
        & (ys >= first[1]) & (ys < first[1] + first[3])
    )
    empty = grid[..., 0] == EMPTY
    agent_pos = _sample_free_cell(k_agent, in_first & empty)
    agent_dir = jax.random.randint(k_dir, (), 0, 4)
    last = rooms[jnp.maximum(count - 1, 0)]
    in_last = (
        (xs >= last[0]) & (xs < last[0] + last[2])
        & (ys >= last[1]) & (ys < last[1] + last[3])
    )
    not_agent = ~((xs == agent_pos[0]) & (ys == agent_pos[1]))
    goal_pos = _sample_free_cell(k_goal, in_last & empty & not_agent)
    grid = grid.at[goal_pos[0], goal_pos[1]].set(
        jnp.asarray([GOAL, GREEN, 0], dtype=jnp.int8)
    )

    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jnp.int32(agent_dir),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_crossing(params: EnvParams, key: jax.Array) -> EnvState:
    """{Simple,Lava}CrossingS{s}N{n}: ``n`` wall/lava rivers on even rows/
    columns with one opening each along a sampled room-to-room path
    (upstream minigrid crossing.py: candidate rivers at every even
    row/column in [2, size-3], shuffled, first ``n`` kept; openings placed
    by walking a shuffled h/v move sequence through the room lattice)."""
    w, h = params.width, params.height
    n = params.num_crossings
    k_riv, k_path, k_open, k_next = jax.random.split(key, 4)
    grid = _base_grid(params)  # border walls + goal at (w-2, h-2)

    obstacle_cell = jnp.asarray(
        [params.obstacle, GREY if params.obstacle == WALL else RED, 0],
        dtype=jnp.int8,
    )
    cand = np.arange(2, h - 2, 2)
    cv = len(cand)
    assert n <= 2 * cv, f"num_crossings={n} too large for size {w}"
    cand_j = jnp.asarray(cand, jnp.int32)

    # Shuffle the 2·cv candidates (ids < cv vertical, else horizontal) and
    # keep the first n; ascending candidate order == upstream's sort.
    perm = jax.random.permutation(k_riv, 2 * cv)
    sel_mask = jnp.zeros(2 * cv, bool).at[perm[:n]].set(True)
    v_mask, h_mask = sel_mask[:cv], sel_mask[cv:]
    nv = v_mask.sum()

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)
    col_river = jnp.zeros(w, bool).at[cand_j].set(v_mask)
    row_river = jnp.zeros(h, bool).at[cand_j].set(h_mask)
    vert = col_river[xs[..., 0]][:, None] & (ys >= 1) & (ys <= h - 2)
    horz = row_river[ys[0]][None, :] & (xs >= 1) & (xs <= w - 2)
    grid = jnp.where((vert | horz)[..., None], obstacle_cell, grid)

    # Room-lattice limits: [0, sorted selected rivers..., size-1].
    big = jnp.int32(10 ** 6)
    sel_v = jnp.sort(jnp.where(v_mask, cand_j, big))
    sel_h = jnp.sort(jnp.where(h_mask, cand_j, big))
    limits_v = jnp.zeros(cv + 2, jnp.int32).at[1:cv + 1].set(sel_v)
    limits_v = limits_v.at[nv + 1].set(h - 1)
    limits_h = jnp.zeros(cv + 2, jnp.int32).at[1:cv + 1].set(sel_h)
    limits_h = limits_h.at[(n - nv) + 1].set(w - 1)

    # Path: nv horizontal moves (each crossing a vertical river) + the
    # rest vertical, shuffled; one opening per move.
    path_h = jax.random.permutation(k_path, jnp.arange(n) < nv)
    open_keys = jax.random.split(k_open, max(n, 1))
    empty_cell = jnp.asarray([EMPTY, 0, 0], dtype=jnp.int8)
    room_i = jnp.int32(0)
    room_j = jnp.int32(0)
    for t in range(n):
        is_h = path_h[t]
        i_h = limits_v[room_i + 1]
        j_h = jax.random.randint(
            open_keys[t], (), limits_h[room_j] + 1, limits_h[room_j + 1]
        )
        i_v = jax.random.randint(
            open_keys[t], (), limits_v[room_i] + 1, limits_v[room_i + 1]
        )
        j_v = limits_h[room_j + 1]
        oi = jnp.where(is_h, i_h, i_v)
        oj = jnp.where(is_h, j_h, j_v)
        grid = grid.at[oi, oj].set(empty_cell)
        room_i = room_i + is_h.astype(jnp.int32)
        room_j = room_j + (~is_h).astype(jnp.int32)

    return EnvState(
        grid=grid,
        agent_pos=jnp.array([1, 1], dtype=jnp.int32),
        agent_dir=jnp.int32(0),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_dynobs(params: EnvParams, key: jax.Array) -> EnvState:
    """DynamicObstaclesEnv: empty room with the goal bottom-right, agent
    at (1,1) facing right (Random variants: uniform pos/dir), and
    ``n_obstacles`` balls on distinct free cells (upstream
    dynamicobstacles.py _gen_grid; sequential place_obj → uniform over
    remaining free cells, agent cell excluded)."""
    k_pos, k_dir, k_obs, k_next = jax.random.split(key, 4)
    grid = _base_grid(params)
    if params.random_start:
        pos = _sample_free_cell(k_pos, grid[..., 0] == EMPTY)
        agent_dir = jax.random.randint(k_dir, (), 0, 4)
    else:
        pos = jnp.array([1, 1], dtype=jnp.int32)
        agent_dir = jnp.int32(0)

    ball_cell = jnp.stack([jnp.int8(BALL), jnp.int8(BLUE), jnp.int8(0)])
    xs = jnp.arange(params.width).reshape(-1, 1)
    ys = jnp.arange(params.height).reshape(1, -1)
    for k in jax.random.split(k_obs, params.n_obstacles):
        free = (
            (grid[..., 0] == EMPTY)
            & ~((xs == pos[0]) & (ys == pos[1]))
        )
        bp = _sample_free_cell(k, free)
        grid = grid.at[bp[0], bp[1]].set(ball_cell)

    return EnvState(
        grid=grid,
        agent_pos=pos,
        agent_dir=agent_dir,
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_unlock(params: EnvParams, key: jax.Array) -> EnvState:
    """UnlockEnv: RoomGrid(room_size=6, 1×2 rooms) → an 11×6 grid split by
    a wall at x=5 with one LOCKED random-color door (y ∈ [1, 4]); a key of
    the door's color and the agent (random dir) placed on random free
    cells of the left room. No goal square — success is toggling the door
    open (upstream minigrid/envs/unlock.py _gen_grid/step). UnlockPickup
    (success == "pickup_box") adds a random-color box in the right room;
    success is picking it up (unlockpickup.py). BlockedUnlockPickup
    (``blocked_door``) additionally drops a ball directly left of the
    locked door (blockedunlockpickup.py)."""
    w, h = params.width, params.height
    k_door, k_color, k_key, k_agent, k_dir, k_next = jax.random.split(key, 6)
    grid = _base_grid(params, goal=False)

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)
    divider = xs == 5
    grid = jnp.where(
        divider[..., None], jnp.asarray([WALL, GREY, 0], dtype=jnp.int8), grid
    )

    door_y = jax.random.randint(k_door, (), 1, h - 1)
    color = jax.random.randint(k_color, (), 0, 6).astype(jnp.int8)
    door_cell = jnp.stack(
        [jnp.int8(DOOR), color, jnp.int8(LOCKED)]
    )
    grid = grid.at[5, door_y].set(door_cell)

    left_room = (xs >= 1) & (xs <= 4) & (ys >= 1) & (ys <= 4)
    box_color = jnp.int8(0)
    if params.success in ("pickup_box", "babyai_pickup"):
        # UnlockPickup: a random-color box on a free right-room cell
        # (upstream unlockpickup.py _gen_grid: add_object(1, 0, "box")
        # BEFORE the door/key, but placement order only matters for RNG
        # sequence, not the distribution). The babyai_pickup success
        # (UnlockPickupDist) matches the box by (type, color) so the
        # distractors below cannot satisfy the mission.
        k_box, k_boxcol, k_key = jax.random.split(k_key, 3)
        right_room = (xs >= 6) & (xs <= 9) & (ys >= 1) & (ys <= 4)
        box_pos = _sample_free_cell(
            k_box, (grid[..., 0] == EMPTY) & right_room
        )
        box_color = jax.random.randint(k_boxcol, (), 0, 6).astype(jnp.int8)
        box_cell = jnp.stack([jnp.int8(BOX), box_color, jnp.int8(0)])
        grid = grid.at[box_pos[0], box_pos[1]].set(box_cell)

    if params.success == "pickup_ball":
        # ObstructedMaze: the target BLUE ball on a free right-room cell
        # (upstream obstructedmaze.py: `self.obj = Ball("blue")`).
        k_tpos, k_key = jax.random.split(k_key)
        right_room = (xs >= 6) & (xs <= 9) & (ys >= 1) & (ys <= 4)
        tpos = _sample_free_cell(k_tpos, (grid[..., 0] == EMPTY) & right_room)
        grid = grid.at[tpos[0], tpos[1]].set(
            jnp.stack([jnp.int8(BALL), jnp.int8(BLUE), jnp.int8(0)]))

    if params.blocked_door:
        # BlockedUnlockPickup / ObstructedMaze "b": a ball on the cell
        # directly left of the locked door (upstream
        # blockedunlockpickup.py _gen_grid: grid.set(pos[0]-1, pos[1],
        # Ball(...))). ObstructedMaze's blocker is never the target's
        # blue (the -v1 colors).
        k_ballcol, k_key = jax.random.split(k_key)
        if params.target_color >= 0:
            c0 = jax.random.randint(k_ballcol, (), 0, 5)
            ball_color = (c0 + (c0 >= params.target_color)).astype(jnp.int8)
        else:
            ball_color = jax.random.randint(k_ballcol, (), 0, 6).astype(jnp.int8)
        grid = grid.at[4, door_y].set(
            jnp.stack([jnp.int8(BALL), ball_color, jnp.int8(0)]))

    key_pos = _sample_free_cell(k_key, (grid[..., 0] == EMPTY) & left_room)
    if params.key_in_box:
        # ObstructedMaze "h": the key hides inside a random-color box —
        # encoded in the box's state channel as 1 + key color, revealed
        # by toggle (upstream obstructedmaze.py add_door(key_in_box=True)).
        k_boxcol, k_agent = jax.random.split(k_agent)
        box_color = jax.random.randint(k_boxcol, (), 0, 6).astype(jnp.int8)
        key_cell = jnp.stack([jnp.int8(BOX), box_color,
                              (color + 1).astype(jnp.int8)])
    else:
        key_cell = jnp.stack([jnp.int8(KEY), color, jnp.int8(0)])
    grid = grid.at[key_pos[0], key_pos[1]].set(key_cell)

    if params.num_objs:
        # BabyAI UnlockPickupDist (upstream unlock.py UnlockPickup
        # (distractors=True) — reconstructed): 4 distractors anywhere,
        # distinct among themselves and from the key and mission box
        # (add_distractors all_unique spans every placed object).
        k_pick, k_rooms, k_dplace, k_agent = jax.random.split(k_agent, 4)
        e_key = 0 * 6 + color.astype(jnp.int32)
        e_box = 2 * 6 + box_color.astype(jnp.int32)
        lo = jnp.minimum(e_key, e_box)
        hi = jnp.maximum(e_key, e_box)
        perm = jax.random.permutation(k_pick, 16)[: params.num_objs]
        q = perm + (perm >= lo)
        q = q + (q >= hi)
        dt = jnp.asarray([KEY, BALL, BOX], jnp.int8)[q // 6]
        dc = (q % 6).astype(jnp.int8)
        right_room = (xs >= 6) & (xs <= 9) & (ys >= 1) & (ys <= 4)
        sides = jax.random.randint(k_rooms, (params.num_objs,), 0, 2)
        free = grid[..., 0] == EMPTY
        for i, kp in enumerate(jax.random.split(k_dplace, params.num_objs)):
            room = jnp.where(sides[i] == 0, left_room, right_room)
            pos = _sample_free_cell(kp, free & room)
            free = free.at[pos[0], pos[1]].set(False)
            grid = grid.at[pos[0], pos[1]].set(
                jnp.stack([dt[i], dc[i], jnp.int8(0)]))

    target = jnp.zeros(8, jnp.int32)
    if params.success == "babyai_pickup":
        target = target.at[0].set(BOX).at[1].set(box_color.astype(jnp.int32))

    agent_pos = _sample_free_cell(k_agent, (grid[..., 0] == EMPTY) & left_room)
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _rooms_reachable(open_wall: jax.Array) -> jax.Array:
    """All-rooms-reachable check on a cols×rows room graph.

    ``open_wall[i, j, k]`` marks a passable connection (a removed wall or
    any door, locked included — upstream ``connect_all``'s ``find_reach``
    traverses doors regardless of lock state) on wall ``k`` of room
    ``(i, j)``; dirs follow DIR_TO_VEC (0=+i, 1=+j, 2=−i, 3=−j).
    Propagates from room (0, 0) for cols·rows steps (the graph diameter
    bound) and returns a scalar bool."""
    cols, rows = open_wall.shape[0], open_wall.shape[1]
    reach = jnp.zeros((cols, rows), bool).at[0, 0].set(True)

    def body(_, reach):
        c0 = reach & open_wall[..., 0]
        c1 = reach & open_wall[..., 1]
        c2 = reach & open_wall[..., 2]
        c3 = reach & open_wall[..., 3]
        z_col = jnp.zeros((1, rows), bool)
        z_row = jnp.zeros((cols, 1), bool)
        reach = (
            reach
            | jnp.concatenate([z_col, c0[:-1]], 0)   # from (i,j) to (i+1,j)
            | jnp.concatenate([z_row, c1[:, :-1]], 1)  # to (i, j+1)
            | jnp.concatenate([c2[1:], z_col], 0)    # to (i-1, j)
            | jnp.concatenate([c3[:, 1:], z_row], 1)  # to (i, j-1)
        )
        return reach

    reach = jax.lax.fori_loop(0, cols * rows, body, reach)
    return jnp.all(reach)


def _reset_keycorridor(params: EnvParams, key: jax.Array) -> EnvState:
    """KeyCorridorEnv: RoomGrid(room_size=S, 3 columns × R rows). The
    middle column's horizontal separators are removed (a corridor), a
    LOCKED random-color door on the left wall of a random right-column
    room hides a random-color ball, the matching key lies in a random
    left-column room, the agent starts in the middle room (row R//2,
    random cell/dir), and doors are added at random walls until every
    room is reachable from room (0, 0) — upstream
    minigrid/envs/keycorridor.py _gen_grid + roomgrid.py connect_all
    (the iterative sampler is reproduced as a bounded while_loop; the
    locked room never receives extra doors, exactly like upstream's
    ``room.locked`` skip)."""
    S, R = params.max_room_size, params.min_rooms
    w, h = params.width, params.height
    (k_room, k_dcol, k_dpos, k_ball, k_bcol, k_krow, k_key, k_agent,
     k_dir, k_connect, k_next) = jax.random.split(key, 11)

    # Static room-boundary walls + corridor openings (numpy: S/R static).
    grid = np.zeros((w, h, 3), dtype=np.int8)
    grid[..., 0] = EMPTY
    for i in range(4):
        grid[i * (S - 1), :, :] = [WALL, GREY, 0]
    for j in range(R + 1):
        grid[:, j * (S - 1), :] = [WALL, GREY, 0]
    for j in range(1, R):  # remove_wall(1, j, 3): open the corridor
        grid[S:2 * (S - 1), j * (S - 1), :] = [EMPTY, 0, 0]
    grid = jnp.asarray(grid)

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)

    def room_interior(i, j):
        return (
            (xs > i * (S - 1)) & (xs < (i + 1) * (S - 1))
            & (ys > j * (S - 1)) & (ys < (j + 1) * (S - 1))
        )

    # Locked door + ball room (right column, random row).
    room_idx = jax.random.randint(k_room, (), 0, R)
    door_color = jax.random.randint(k_dcol, (), 0, 6).astype(jnp.int8)
    door_y = room_idx * (S - 1) + jax.random.randint(k_dpos, (), 1, S - 1)
    grid = grid.at[2 * (S - 1), door_y].set(
        jnp.stack([jnp.int8(DOOR), door_color, jnp.int8(LOCKED)]))
    ball_pos = _sample_free_cell(
        k_ball, (grid[..., 0] == EMPTY) & room_interior(2, room_idx))
    ball_color = jax.random.randint(k_bcol, (), 0, 6).astype(jnp.int8)
    grid = grid.at[ball_pos[0], ball_pos[1]].set(
        jnp.stack([jnp.int8(BALL), ball_color, jnp.int8(0)]))

    # Matching key in a random left-column room.
    key_row = jax.random.randint(k_krow, (), 0, R)
    key_pos = _sample_free_cell(
        k_key, (grid[..., 0] == EMPTY) & room_interior(0, key_row))
    grid = grid.at[key_pos[0], key_pos[1]].set(
        jnp.stack([jnp.int8(KEY), door_color, jnp.int8(0)]))

    # Agent in the middle room of the corridor.
    agent_pos = _sample_free_cell(
        k_agent, (grid[..., 0] == EMPTY) & room_interior(1, R // 2))

    # connect_all(): corridor openings + the locked door seed the
    # connection graph; sample (i, j, k) walls until all rooms reach.
    open_wall = jnp.zeros((3, R, 4), bool)
    for j in range(1, R):
        open_wall = open_wall.at[1, j, 3].set(True)
        open_wall = open_wall.at[1, j - 1, 1].set(True)
    open_wall = open_wall.at[2, room_idx, 2].set(True)
    open_wall = open_wall.at[1, room_idx, 0].set(True)

    def cond(carry):
        grid, open_wall, k, n = carry
        return (~_rooms_reachable(open_wall)) & (n < 256)

    def body(carry):
        grid, open_wall, k, n = carry
        k, k_i, k_j, k_k, k_c, k_o = jax.random.split(k, 6)
        i = jax.random.randint(k_i, (), 0, 3)
        j = jax.random.randint(k_j, (), 0, R)
        d = jax.random.randint(k_k, (), 0, 4)
        di, dj = jnp.asarray(DIR_TO_VEC)[d]
        ni, nj = i + di, j + dj
        in_range = (ni >= 0) & (ni < 3) & (nj >= 0) & (nj < R)
        locked_room = ((i == 2) & (j == room_idx)) | (
            (ni == 2) & (nj == room_idx))
        valid = in_range & ~open_wall[i, j, d] & ~locked_room
        off = jax.random.randint(k_o, (), 1, S - 1)
        x = jnp.where(d == 0, (i + 1) * (S - 1),
                      jnp.where(d == 2, i * (S - 1), i * (S - 1) + off))
        y = jnp.where(d == 1, (j + 1) * (S - 1),
                      jnp.where(d == 3, j * (S - 1), j * (S - 1) + off))
        color = jax.random.randint(k_c, (), 0, 6).astype(jnp.int8)
        door = jnp.stack([jnp.int8(DOOR), color, jnp.int8(CLOSED)])
        grid = jnp.where(valid, grid.at[x, y].set(door), grid)
        nc = jnp.clip(ni, 0, 2)
        nr = jnp.clip(nj, 0, R - 1)
        open_wall = jnp.where(
            valid,
            open_wall.at[i, j, d].set(True).at[nc, nr, (d + 2) % 4].set(True),
            open_wall,
        )
        return grid, open_wall, k, n + 1

    grid, open_wall, _, _ = jax.lax.while_loop(
        cond, body, (grid, open_wall, k_connect, jnp.int32(0)))

    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_obstructedfull(params: EnvParams, key: jax.Array) -> EnvState:
    """ObstructedMaze Full family (2Dl*/1Q/2Q/Full): 3×3 RoomGrid of 6×6
    rooms (16×16 grid, walls at multiples of 5). Door colors are a random
    permutation; for each of the first ``min_rooms`` quarters the middle
    room (1,1) gets an unlocked door (wall i, color[i]) onto side room
    ``SIDE[i]``, and the side room gets LOCKED doors on walls (i±1)%4
    with colors color[(i±1)%6], each optionally blocked by a non-blue
    ball on the side-room cell before the door and with its key
    (optionally hidden in a box) placed in the side room. The target BLUE
    ball sits in a uniformly chosen corner among the first ``min_rooms``;
    the agent starts in ``params.agent_room`` (upstream
    minigrid/envs/obstructedmaze.py ObstructedMaze_Full._gen_grid —
    reconstructed; the blocker/box colors follow this module's 1Dl*
    convention: uniform, blockers never the target's blue)."""
    w, h = params.width, params.height
    Q = params.min_rooms
    SIDE = ((2, 1), (1, 2), (0, 1), (1, 0))
    CORNER = ((2, 0), (2, 2), (0, 2), (0, 0))

    grid = np.zeros((w, h, 3), dtype=np.int8)
    grid[..., 0] = EMPTY
    for t in range(4):
        grid[t * 5, :, :] = [WALL, GREY, 0]
        grid[:, t * 5, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)

    def room_interior(i, j):
        return ((xs > i * 5) & (xs < (i + 1) * 5)
                & (ys > j * 5) & (ys < (j + 1) * 5))

    def door_pos(i, j, d, off):
        # Wall ``d`` (DIR_TO_VEC order) of room (i, j); off traced ∈ [1,4]
        # (upstream RoomGrid._gen_grid pre-samples these uniforms).
        if d == 0:
            return (i + 1) * 5, j * 5 + off
        if d == 1:
            return i * 5 + off, (j + 1) * 5
        if d == 2:
            return i * 5, j * 5 + off
        return i * 5 + off, j * 5

    k_col, k_ballroom, k_ballpos, k_agent, k_dir, k_next, k_rest = (
        jax.random.split(key, 7))
    door_colors = jax.random.permutation(k_col, 6).astype(jnp.int8)
    for i in range(Q):
        si, sj = SIDE[i]
        (k_moff, k_rest) = jax.random.split(k_rest)
        x, y = door_pos(1, 1, i, jax.random.randint(k_moff, (), 1, 5))
        grid = grid.at[x, y].set(
            jnp.stack([jnp.int8(DOOR), door_colors[i], jnp.int8(CLOSED)]))
        # Doors + blockers first, keys after — a key sampled on the cell
        # before a later door would otherwise be overwritten by that
        # door's blocker (the blocker cell is forced, not sampled).
        for kk in (-1, 1):
            d = (i + kk) % 4
            color = door_colors[(i + kk) % 6]
            k_off, k_bcol, k_rest = jax.random.split(k_rest, 3)
            x, y = door_pos(si, sj, d, jax.random.randint(k_off, (), 1, 5))
            grid = grid.at[x, y].set(
                jnp.stack([jnp.int8(DOOR), color, jnp.int8(LOCKED)]))
            if params.blocked_door:
                bx = x - int(DIR_TO_VEC[d][0])
                by = y - int(DIR_TO_VEC[d][1])
                c0 = jax.random.randint(k_bcol, (), 0, 5)
                ball_color = (c0 + (c0 >= BLUE)).astype(jnp.int8)
                grid = grid.at[bx, by].set(
                    jnp.stack([jnp.int8(BALL), ball_color, jnp.int8(0)]))
        for kk in (-1, 1):
            color = door_colors[(i + kk) % 6]
            k_kpos, k_boxcol, k_rest = jax.random.split(k_rest, 3)
            kpos = _sample_free_cell(
                k_kpos, (grid[..., 0] == EMPTY) & room_interior(si, sj))
            if params.key_in_box:
                box_color = jax.random.randint(
                    k_boxcol, (), 0, 6).astype(jnp.int8)
                cell = jnp.stack([jnp.int8(BOX), box_color,
                                  (color + 1).astype(jnp.int8)])
            else:
                cell = jnp.stack([jnp.int8(KEY), color, jnp.int8(0)])
            grid = grid.at[kpos[0], kpos[1]].set(cell)

    ball_room = jax.random.randint(k_ballroom, (), 0, Q)
    corner_masks = jnp.stack([room_interior(*CORNER[t]) for t in range(Q)])
    ball_pos = _sample_free_cell(
        k_ballpos, corner_masks[ball_room] & (grid[..., 0] == EMPTY))
    grid = grid.at[ball_pos[0], ball_pos[1]].set(
        jnp.stack([jnp.int8(BALL), jnp.int8(BLUE), jnp.int8(0)]))

    agent_pos = _sample_free_cell(
        k_agent, (grid[..., 0] == EMPTY) & room_interior(*params.agent_room))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_playground(params: EnvParams, key: jax.Array) -> EnvState:
    """PlaygroundEnv: 19×19, 3×3 rooms of 6×6 (walls at x,y ∈ {6, 12}),
    one CLOSED random-color door per internal wall segment (12 doors;
    door row/column uniform over the five interior offsets — upstream's
    exclusive-high ``_rand_int(yT + 1, yB)`` with the 6-cell room pitch),
    random agent start anywhere, then 12 random objects (uniform
    key/ball/box × uniform color) on free cells. No goal, no reward
    (upstream minigrid/envs/playground.py _gen_grid — reconstructed)."""
    w, h = params.width, params.height
    grid = np.zeros((w, h, 3), dtype=np.int8)
    grid[..., 0] = EMPTY
    for t in (0, 6, 12, w - 1):
        grid[t, :, :] = [WALL, GREY, 0]
        grid[:, t, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)

    k_doors, k_agent, k_dir, k_objs, k_next = jax.random.split(key, 5)
    # Vertical doors at x ∈ {6, 12} per room row; horizontal at y ∈ {6, 12}
    # per room column (upstream: one door per segment, y/x uniform over
    # the 5 interior offsets, color uniform).
    for i in range(2):
        for j in range(3):
            k_off, k_col, k_off2, k_col2, k_doors = jax.random.split(
                k_doors, 5)
            off = jax.random.randint(k_off, (), 1, 6)
            color = jax.random.randint(k_col, (), 0, 6).astype(jnp.int8)
            grid = grid.at[(i + 1) * 6, j * 6 + off].set(
                jnp.stack([jnp.int8(DOOR), color, jnp.int8(CLOSED)]))
            off2 = jax.random.randint(k_off2, (), 1, 6)
            color2 = jax.random.randint(k_col2, (), 0, 6).astype(jnp.int8)
            grid = grid.at[j * 6 + off2, (i + 1) * 6].set(
                jnp.stack([jnp.int8(DOOR), color2, jnp.int8(CLOSED)]))

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)
    agent_pos = _sample_free_cell(k_agent, grid[..., 0] == EMPTY)
    not_agent = (xs != agent_pos[0]) | (ys != agent_pos[1])
    obj_types = jnp.asarray([KEY, BALL, BOX], jnp.int8)
    for _ in range(12):
        k_t, k_c, k_p, k_objs = jax.random.split(k_objs, 4)
        t = obj_types[jax.random.randint(k_t, (), 0, 3)]
        c = jax.random.randint(k_c, (), 0, 6).astype(jnp.int8)
        pos = _sample_free_cell(
            k_p, (grid[..., 0] == EMPTY) & not_agent)
        grid = grid.at[pos[0], pos[1]].set(
            jnp.stack([t, c, jnp.int8(0)]))

    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_distshift(params: EnvParams, key: jax.Array) -> EnvState:
    """DistShiftEnv: deterministic 9×7 layout — goal at (width-2, 1), a
    3-cell lava strip at x ∈ [3, width-4] in ``strip_row``, agent (1, 1)
    facing right (upstream minigrid/envs/distshift.py _gen_grid). The key
    is consumed only by autoreset."""
    w = params.width
    grid = np.zeros((w, params.height, 3), dtype=np.int8)
    grid[..., 0] = EMPTY
    grid[0, :, :] = grid[w - 1, :, :] = [WALL, GREY, 0]
    grid[:, 0, :] = grid[:, params.height - 1, :] = [WALL, GREY, 0]
    grid[w - 2, 1, :] = [GOAL, GREEN, 0]
    for i in range(w - 6):
        grid[3 + i, params.strip_row, :] = [LAVA, RED, 0]
    return EnvState(
        grid=jnp.asarray(grid),
        agent_pos=jnp.array([1, 1], dtype=jnp.int32),
        agent_dir=jnp.int32(0),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=key,
    )


def _reset_redblue(params: EnvParams, key: jax.Array) -> EnvState:
    """RedBlueDoorEnv: a size×size room centered in a 2size×size grid
    (walls at x = size//2 and x = size//2 + size - 1), a CLOSED red door
    at a random y on the left room wall, a closed blue door on the right
    room wall, agent on a random free room cell with a random direction
    (upstream redbluedoors.py _gen_grid: place_agent over the room
    rect)."""
    size = params.height
    lx, rx = size // 2, size // 2 + size - 1
    k_red, k_blue, k_agent, k_dir, k_next = jax.random.split(key, 5)
    grid = _base_grid(params, goal=False)

    xs = jnp.arange(params.width).reshape(-1, 1)
    ys = jnp.arange(params.height).reshape(1, -1)
    room_walls = (xs == lx) | (xs == rx)
    grid = jnp.where(
        room_walls[..., None], jnp.asarray([WALL, GREY, 0], dtype=jnp.int8),
        grid,
    )
    red_y = jax.random.randint(k_red, (), 1, size - 1)
    blue_y = jax.random.randint(k_blue, (), 1, size - 1)
    grid = grid.at[lx, red_y].set(
        jnp.asarray([DOOR, RED, CLOSED], dtype=jnp.int8))
    grid = grid.at[rx, blue_y].set(
        jnp.asarray([DOOR, BLUE, CLOSED], dtype=jnp.int8))

    room = (xs > lx) & (xs < rx) & (ys >= 1) & (ys <= size - 2)
    agent_pos = _sample_free_cell(k_agent, (grid[..., 0] == EMPTY) & room)
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_lockedroom(params: EnvParams, key: jax.Array) -> EnvState:
    """LockedRoomEnv (size 19): vertical hallway walls at width//2 ± 2,
    three room rows per side split at y = n·(height−1)//3, one door per
    room at (wall, row+3); a uniformly chosen room is LOCKED and holds
    the goal, the matching-color key sits in a different room, door
    colors are a uniform permutation; the agent starts on a free hallway
    cell (upstream minigrid/envs/lockedroom.py _gen_grid —
    reconstructed)."""
    w, h = params.width, params.height
    (k_lock, k_goal, k_col, k_keyroom, k_keypos, k_agent,
     k_dir, k_next) = jax.random.split(key, 8)
    lwall, rwall = w // 2 - 2, w // 2 + 2

    grid = np.zeros((w, h, 3), dtype=np.int8)
    grid[..., 0] = EMPTY
    grid[0, :, :] = grid[w - 1, :, :] = [WALL, GREY, 0]
    grid[:, 0, :] = grid[:, h - 1, :] = [WALL, GREY, 0]
    grid[lwall, :, :] = grid[rwall, :, :] = [WALL, GREY, 0]
    rooms = []  # (top_x, top_y, door_x, door_y) in upstream's order
    for n in range(3):
        j = n * (h - 1) // 3
        grid[:lwall, j, :] = [WALL, GREY, 0]
        grid[rwall:, j, :] = [WALL, GREY, 0]
        rooms.append((0, j, lwall, j + 3))
        rooms.append((rwall, j, rwall, j + 3))
    grid = jnp.asarray(grid)

    room_w, room_h = lwall + 1, h // 3 + 1
    tops = jnp.asarray([(r[0], r[1]) for r in rooms], jnp.int32)
    doors = jnp.asarray([(r[2], r[3]) for r in rooms], jnp.int32)

    def rand_pos(k, room_idx):
        # upstream LockedRoom.rand_pos: uniform over the room interior
        kx, ky = jax.random.split(k)
        x = tops[room_idx, 0] + jax.random.randint(kx, (), 1, room_w - 1)
        y = tops[room_idx, 1] + jax.random.randint(ky, (), 1, room_h - 1)
        return x, y

    locked = jax.random.randint(k_lock, (), 0, 6)
    gx, gy = rand_pos(k_goal, locked)
    grid = grid.at[gx, gy].set(jnp.asarray([GOAL, GREEN, 0], jnp.int8))

    # Door colors: sequential draws without replacement == a permutation.
    colors = jax.random.permutation(k_col, 6).astype(jnp.int8)
    for i in range(6):
        state_i = jnp.where(i == locked, LOCKED, CLOSED).astype(jnp.int8)
        grid = grid.at[doors[i, 0], doors[i, 1]].set(
            jnp.stack([jnp.int8(DOOR), colors[i], state_i]))

    # Key of the locked door's color in a uniformly-chosen OTHER room.
    k0 = jax.random.randint(k_keyroom, (), 0, 5)
    key_room = k0 + (k0 >= locked)
    kx, ky = rand_pos(k_keypos, key_room)
    grid = grid.at[kx, ky].set(
        jnp.stack([jnp.int8(KEY), colors[locked], jnp.int8(0)]))

    # Agent on a free hallway cell (upstream place_agent top=(lwall, 0),
    # size=(rwall-lwall, h) — rejection over empty cells).
    xs = jnp.arange(w).reshape(w, 1)
    hallway = (xs >= lwall) & (xs < rwall)
    agent_pos = _sample_free_cell(k_agent, (grid[..., 0] == EMPTY) & hallway)
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
    )


def _reset_memory(params: EnvParams, key: jax.Array) -> EnvState:
    """MemoryEnv: a 3-cell-tall start room holding one green key-or-ball,
    a 1-cell hallway to a T-fork with a green ball and a green key on the
    far side; stepping onto the cell in front of the object matching the
    start room's terminates with the time-scaled reward, the other side
    with 0 (upstream minigrid/envs/memory.py _gen_grid — reconstructed).
    Success/failure cells are stored in ``EnvState.target`` as
    [sx, sy, fx, fy, 0...]."""
    w, h = params.width, params.height
    k_len, k_agent, k_start, k_order, k_next = jax.random.split(key, 5)
    mid = h // 2
    upper, lower = mid - 2, mid + 2
    hallway_end = (jax.random.randint(k_len, (), 4, w - 2)
                   if params.random_length else jnp.int32(w - 3))

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)
    border = (xs == 0) | (xs == w - 1) | (ys == 0) | (ys == h - 1)
    start_room = ((ys == upper) | (ys == lower)) & (xs >= 1) & (xs <= 4)
    start_corner = (xs == 4) & ((ys == upper + 1) | (ys == lower - 1))
    hallway = (((ys == upper + 1) | (ys == lower - 1))
               & (xs >= 5) & (xs < hallway_end))
    vertical = (xs == hallway_end) & (ys != mid)
    wall = border | start_room | start_corner | hallway | vertical
    grid = jnp.where(
        wall[..., None], jnp.asarray([WALL, GREY, 0], dtype=jnp.int8),
        jnp.zeros((w, h, 3), jnp.int8).at[..., 0].set(EMPTY))

    # Start-room object and the fork pair (all green; upstream fixes the
    # color and randomizes which side holds the ball vs the key).
    start_is_key = jax.random.randint(k_start, (), 0, 2) == 0
    start_obj = jnp.where(start_is_key, KEY, BALL).astype(jnp.int8)
    grid = grid.at[1, mid - 1].set(
        jnp.stack([start_obj, jnp.int8(GREEN), jnp.int8(0)]))
    top_is_ball = jax.random.randint(k_order, (), 0, 2) == 0
    top_obj = jnp.where(top_is_ball, BALL, KEY).astype(jnp.int8)
    bot_obj = jnp.where(top_is_ball, KEY, BALL).astype(jnp.int8)
    grid = grid.at[hallway_end + 1, mid - 2].set(
        jnp.stack([top_obj, jnp.int8(GREEN), jnp.int8(0)]))
    grid = grid.at[hallway_end + 1, mid + 2].set(
        jnp.stack([bot_obj, jnp.int8(GREEN), jnp.int8(0)]))

    # success = the cell in FRONT of the matching object; failure = in
    # front of the other one.
    top_matches = top_obj == start_obj
    sx = hallway_end + 1
    sy = jnp.where(top_matches, mid - 1, mid + 1)
    fy = jnp.where(top_matches, mid + 1, mid - 1)
    target = (jnp.zeros(8, jnp.int32).at[0].set(sx).at[1].set(sy)
              .at[2].set(sx).at[3].set(fy))

    agent_x = jax.random.randint(k_agent, (), 1, hallway_end + 1)
    return EnvState(
        grid=grid,
        agent_pos=jnp.stack([agent_x, jnp.int32(mid)]),
        agent_dir=jnp.int32(0),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _reset_gotodoor(params: EnvParams, key: jax.Array) -> EnvState:
    """GoToDoorEnv: the room's width/height are re-sampled per episode in
    [5, size]; four CLOSED doors of distinct colors, one per wall side at
    a random position; the agent starts on a random free room cell; the
    mission targets one door uniformly (upstream minigrid/envs/gotodoor.py
    _gen_grid — reconstructed; the package is not in this image). Cells
    outside the sampled room stay EMPTY, matching upstream's un-encoded
    ``None`` cells."""
    w, h = params.width, params.height
    (k_rw, k_rh, k_d0, k_d1, k_d2, k_d3, k_col, k_agent, k_dir, k_tgt,
     k_next) = jax.random.split(key, 11)
    rw = jax.random.randint(k_rw, (), 5, w + 1)
    rh = jax.random.randint(k_rh, (), 5, h + 1)

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)
    wall = (((xs == 0) | (xs == rw - 1)) & (ys < rh)) | (
        ((ys == 0) | (ys == rh - 1)) & (xs < rw))
    grid = jnp.where(
        wall[..., None], jnp.asarray([WALL, GREY, 0], dtype=jnp.int8),
        jnp.zeros((w, h, 3), jnp.int8).at[..., 0].set(EMPTY))

    # One door per wall, in upstream's doorPos order: top, bottom, left,
    # right; distinct colors via sequential rejection == a uniform
    # 4-prefix of a color permutation.
    door_x = jnp.stack([
        jax.random.randint(k_d0, (), 2, rw - 2),
        jax.random.randint(k_d1, (), 2, rw - 2),
        jnp.int32(0),
        rw - 1,
    ])
    door_y = jnp.stack([
        jnp.int32(0),
        rh - 1,
        jax.random.randint(k_d2, (), 2, rh - 2),
        jax.random.randint(k_d3, (), 2, rh - 2),
    ])
    colors = jax.random.permutation(k_col, 6)[:4].astype(jnp.int8)
    for i in range(4):
        grid = grid.at[door_x[i], door_y[i]].set(
            jnp.stack([jnp.int8(DOOR), colors[i], jnp.int8(CLOSED)]))

    room = (xs < rw) & (ys < rh)
    agent_pos = _sample_free_cell(k_agent, (grid[..., 0] == EMPTY) & room)

    t = jax.random.randint(k_tgt, (), 0, 4)
    target = jnp.zeros(8, jnp.int32).at[0].set(DOOR).at[1].set(
        colors[t].astype(jnp.int32)).at[2].set(door_x[t]).at[3].set(door_y[t])
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _reset_fetch(params: EnvParams, key: jax.Array) -> EnvState:
    """FetchEnv: ``num_objs`` keys/balls with independently random types
    and colors (duplicate (type, color) pairs allowed) on free cells, the
    agent on a random free cell, and a uniformly chosen object as the
    mission target (upstream minigrid/envs/fetch.py _gen_grid —
    reconstructed)."""
    k_objs, k_agent, k_dir, k_tgt, k_next = jax.random.split(key, 5)
    grid = _base_grid(params, goal=False)

    types = jnp.zeros(params.num_objs, jnp.int8)
    colors = jnp.zeros(params.num_objs, jnp.int8)
    for i, k in enumerate(jax.random.split(k_objs, params.num_objs)):
        k_type, k_color, k_pos = jax.random.split(k, 3)
        obj = jnp.where(jax.random.randint(k_type, (), 0, 2) == 0,
                        KEY, BALL).astype(jnp.int8)
        col = jax.random.randint(k_color, (), 0, 6).astype(jnp.int8)
        pos = _sample_free_cell(k_pos, grid[..., 0] == EMPTY)
        grid = grid.at[pos[0], pos[1]].set(jnp.stack([obj, col, jnp.int8(0)]))
        types, colors = types.at[i].set(obj), colors.at[i].set(col)

    agent_pos = _sample_free_cell(k_agent, grid[..., 0] == EMPTY)
    t = jax.random.randint(k_tgt, (), 0, params.num_objs)
    target = jnp.zeros(8, jnp.int32).at[0].set(
        types[t].astype(jnp.int32)).at[1].set(colors[t].astype(jnp.int32))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _distinct_objects(key: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """``n`` distinct (type, color) pairs over {key, ball, box} × 6 colors.
    Upstream samples type and color independently and rejects duplicates
    (gotoobject.py/putnear.py) — the resulting distribution is a uniform
    n-prefix of a permutation of the 18 combos."""
    combo = jax.random.permutation(key, 3 * 6)[:n]
    types = jnp.asarray([KEY, BALL, BOX], jnp.int8)[combo // 6]
    return types, (combo % 6).astype(jnp.int8)


def _reset_gotoobject(params: EnvParams, key: jax.Array) -> EnvState:
    """GoToObjectEnv: ``num_objs`` DISTINCT (type, color) key/ball/box
    objects on free cells, agent on a random free cell, one object chosen
    uniformly as the mission target (upstream minigrid/envs/gotoobject.py
    _gen_grid — reconstructed)."""
    k_pairs, k_place, k_agent, k_dir, k_tgt, k_next = jax.random.split(key, 6)
    grid = _base_grid(params, goal=False)
    types, colors = _distinct_objects(k_pairs, params.num_objs)

    pos_x = jnp.zeros(params.num_objs, jnp.int32)
    pos_y = jnp.zeros(params.num_objs, jnp.int32)
    for i, k in enumerate(jax.random.split(k_place, params.num_objs)):
        pos = _sample_free_cell(k, grid[..., 0] == EMPTY)
        grid = grid.at[pos[0], pos[1]].set(
            jnp.stack([types[i], colors[i], jnp.int8(0)]))
        pos_x, pos_y = pos_x.at[i].set(pos[0]), pos_y.at[i].set(pos[1])

    agent_pos = _sample_free_cell(k_agent, grid[..., 0] == EMPTY)
    t = jax.random.randint(k_tgt, (), 0, params.num_objs)
    target = jnp.zeros(8, jnp.int32).at[0].set(
        types[t].astype(jnp.int32)).at[1].set(
        colors[t].astype(jnp.int32)).at[2].set(pos_x[t]).at[3].set(pos_y[t])
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _reset_putnear(params: EnvParams, key: jax.Array) -> EnvState:
    """PutNearEnv: ``num_objs`` distinct (type, color) objects placed so
    no two are within Chebyshev distance 1 of each other (upstream
    putnear.py's ``near_obj`` reject_fn); the mission picks a move object
    and a DIFFERENT near-target object, both uniform (reconstructed)."""
    (k_pairs, k_place, k_agent, k_dir, k_move, k_tgt,
     k_next) = jax.random.split(key, 7)
    w, h = params.width, params.height
    grid = _base_grid(params, goal=False)
    types, colors = _distinct_objects(k_pairs, params.num_objs)

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)
    near_any = jnp.zeros((w, h), bool)
    pos_x = jnp.zeros(params.num_objs, jnp.int32)
    pos_y = jnp.zeros(params.num_objs, jnp.int32)
    for i, k in enumerate(jax.random.split(k_place, params.num_objs)):
        pos = _sample_free_cell(k, (grid[..., 0] == EMPTY) & ~near_any)
        grid = grid.at[pos[0], pos[1]].set(
            jnp.stack([types[i], colors[i], jnp.int8(0)]))
        near_any = near_any | (
            (jnp.abs(xs - pos[0]) <= 1) & (jnp.abs(ys - pos[1]) <= 1))
        pos_x, pos_y = pos_x.at[i].set(pos[0]), pos_y.at[i].set(pos[1])

    agent_pos = _sample_free_cell(k_agent, grid[..., 0] == EMPTY)
    mv = jax.random.randint(k_move, (), 0, params.num_objs)
    # targetIdx rejection-sampled until != moveIdx == uniform over the rest.
    t0 = jax.random.randint(k_tgt, (), 0, params.num_objs - 1)
    tg = t0 + (t0 >= mv)
    target = (jnp.zeros(8, jnp.int32)
              .at[0].set(types[mv].astype(jnp.int32))
              .at[1].set(colors[mv].astype(jnp.int32))
              .at[2].set(types[tg].astype(jnp.int32))
              .at[3].set(colors[tg].astype(jnp.int32))
              .at[4].set(pos_x[tg]).at[5].set(pos_y[tg]))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _objs_reachable(params: EnvParams, grid: jax.Array,
                    agent_pos: jax.Array) -> jax.Array:
    """BabyAI's ``check_objs_reachable`` (upstream
    minigrid/envs/babyai/core/roomgrid_level.py — reconstructed) as a
    boolean: flood-fill from the agent over EMPTY and DOOR cells
    (upstream expands through any door regardless of open/locked state
    — the agent could open it — while other objects and walls are
    reached but do not expand), then require every non-wall object cell
    to be in the reached set — i.e. 4-adjacent to a filled cell. Border
    walls are never EMPTY, so the jnp.roll wraparound can never mark a
    cell across the edge."""
    free = (grid[..., 0] == EMPTY) | (grid[..., 0] == DOOR)
    reach = jnp.zeros((params.width, params.height), bool)
    reach = reach.at[agent_pos[0], agent_pos[1]].set(True)

    def body(carry):
        r, _ = carry
        grown = (r | jnp.roll(r, 1, 0) | jnp.roll(r, -1, 0)
                 | jnp.roll(r, 1, 1) | jnp.roll(r, -1, 1)) & free
        return grown, jnp.any(grown != r)

    # Fixed-point while_loop: W·H is the safe bound but the flood
    # reaches its fixed point in ~diameter steps, so exit early (this
    # runs inside every autoreset — resets are never differentiated,
    # so while_loop is fine).
    reach, _ = jax.lax.while_loop(
        lambda c: c[1], body, (reach, jnp.bool_(True)))
    near = (reach | jnp.roll(reach, 1, 0) | jnp.roll(reach, -1, 0)
            | jnp.roll(reach, 1, 1) | jnp.roll(reach, -1, 1))
    objs = (grid[..., 0] != EMPTY) & (grid[..., 0] != WALL)
    return jnp.all(near | ~objs)


def _babyai_room(params: EnvParams, key: jax.Array, sample_objs,
                 check_reachable: bool = True):
    """Shared BabyAI single-room generator: the agent on a random
    interior cell, then the sampled objects on the remaining free cells
    (upstream orders agent/objects differently per level; sequential
    uniform sampling without replacement is exchangeable, so the joint
    layout distribution is identical). With ``check_reachable`` the
    whole layout is rejection-sampled until ``check_objs_reachable``
    passes — upstream retries unboundedly; 64 attempts keep the jitted
    while_loop safe (at ≤9 objects in a ≥5×5 interior a blocked layout
    is already rare, 64 in a row is astronomically so).

    ``sample_objs(key) -> (types, colors)`` int8 arrays of static
    length. Returns (grid, agent_pos, agent_dir, types, colors)."""

    def build(k):
        k_obj, k_agent, k_dir, k_place = jax.random.split(k, 4)
        types, colors = sample_objs(k_obj)
        grid = _base_grid(params, goal=False)
        free = grid[..., 0] == EMPTY
        agent_pos = _sample_free_cell(k_agent, free)
        agent_dir = jax.random.randint(k_dir, (), 0, 4)
        free = free.at[agent_pos[0], agent_pos[1]].set(False)
        for i, kp in enumerate(jax.random.split(k_place, types.shape[0])):
            pos = _sample_free_cell(kp, free)
            free = free.at[pos[0], pos[1]].set(False)
            grid = grid.at[pos[0], pos[1]].set(
                jnp.stack([types[i], colors[i], jnp.int8(0)]))
        return grid, agent_pos, agent_dir, types, colors

    if not check_reachable:
        return build(key)

    def attempt(k):
        k, k_b = jax.random.split(k)
        grid, agent_pos, agent_dir, types, colors = build(k_b)
        ok = _objs_reachable(params, grid, agent_pos)
        return ok, k, grid, agent_pos, agent_dir, types, colors

    def cond(c):
        ok, attempts = c[0], c[-1]
        return (~ok) & (attempts < 64)

    def body(c):
        return attempt(c[1])[:7] + (c[-1] + 1,)

    first = attempt(key) + (jnp.int32(1),)
    out = jax.lax.while_loop(cond, body, first)
    return out[2:7]


def _reset_babyai_goto(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI GoTo tier (upstream minigrid/envs/babyai/goto.py —
    reconstructed): one bordered room via `_babyai_room`. With
    ``target_color >= 0`` (GoToRedBall variants) object 0 is the fixed
    (BALL, RED) target and ``num_objs`` distractors follow — random
    key/ball/box × 6 colors, recolored grey when ``grey_dists``;
    otherwise (GoToObj / GoToLocal) all ``num_objs`` objects are random
    and the target is a uniform draw among them. ``rb_target``
    (GoToRedBlueBall) makes object 0 a ball colored red or blue
    (uniform per attempt, like upstream's re-run on RejectSampling) and
    draws each distractor uniformly over the 16 (type, color) pairs
    that are not a red or blue ball — equivalent to upstream's
    reject-the-whole-layout rule because the predicate factorizes per
    distractor."""
    k_room, k_tgt, k_next = jax.random.split(key, 3)
    # type_only (OneRoomS{n}, upstream other.py — reconstructed): object
    # 0 is a ball of RANDOM color and the mission is type-only
    # (PickupInstr(ObjDesc("ball"))).
    fixed_target = (
        (params.target_color >= 0) or params.rb_target or params.type_only
    )
    n_objs = params.num_objs + (1 if fixed_target else 0)

    def sample_objs(k):
        k_type, k_color = jax.random.split(k)
        if params.rb_target:
            # pairs type-major (key, ball, box) × 6 colors; skip
            # ball-red (6) and ball-blue (8)
            u = jax.random.randint(k_type, (n_objs,), 0, 16)
            pidx = u + (u >= 6) + (u >= 7)
            types = jnp.asarray([KEY, BALL, BOX], jnp.int8)[pidx // 6]
            colors = (pidx % 6).astype(jnp.int8)
            types = types.at[0].set(BALL)
            return types, colors.at[0].set(
                jnp.asarray([RED, BLUE], jnp.int8)[
                    jax.random.randint(k_color, (), 0, 2)])
        types = jnp.asarray([KEY, BALL, BOX], jnp.int8)[
            jax.random.randint(k_type, (n_objs,), 0, 3)]
        colors = (jnp.full((n_objs,), GREY, jnp.int8) if params.grey_dists
                  else jax.random.randint(k_color, (n_objs,), 0, 6)
                  .astype(jnp.int8))
        if fixed_target:
            types = types.at[0].set(BALL)
            if not params.type_only:
                colors = colors.at[0].set(RED)
        return types, colors

    grid, agent_pos, agent_dir, types, colors = _babyai_room(
        params, k_room, sample_objs)

    if fixed_target:
        tcol = (jnp.int32(-1) if params.type_only
                else colors[0].astype(jnp.int32))
        target = jnp.zeros(8, jnp.int32).at[0].set(BALL).at[1].set(tcol)
    else:
        t = jax.random.randint(k_tgt, (), 0, n_objs)
        target = jnp.zeros(8, jnp.int32).at[0].set(
            types[t].astype(jnp.int32)).at[1].set(colors[t].astype(jnp.int32))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _reset_babyai_gotomaze(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI maze tier sharing one mission generator (upstream
    minigrid/envs/babyai/goto.py GoTo/GoToOpen/GoToObjMaze* and
    pickup.py Pickup/UnblockPickup — reconstructed): a
    ``max_rooms`` × ``min_rooms`` RoomGrid of ``max_room_size`` rooms.
    gen_mission order matches upstream: place_agent() in a uniformly
    random room, connect_all() (random walls get CLOSED random-color
    doors until every room reaches (0, 0); the door offset on the wall
    is sampled at add time, this module's RoomGrid convention), then
    ``num_objs`` distractors — random key/ball/box × 6 colors with
    duplicates allowed (all_unique=False), each in a uniformly random
    room — then check_objs_reachable() rejection-samples the whole
    layout (``invert_reach``: UnblockPickup instead REJECTS layouts
    where everything is reachable). The mission object is a uniform
    draw among the distractors → GoToInstr (success="babyai_goto") or
    PickupInstr (success="babyai_pickup"). ``doors_open`` reproduces
    open_all_doors() after generation (GoToOpen/GoToObjMazeOpen)."""
    S, R, C = params.max_room_size, params.min_rooms, params.max_rooms
    w, h = params.width, params.height
    n = params.num_objs

    base = np.zeros((w, h, 3), dtype=np.int8)
    base[..., 0] = EMPTY
    for i in range(C + 1):
        base[i * (S - 1), :, :] = [WALL, GREY, 0]
    for j in range(R + 1):
        base[:, j * (S - 1), :] = [WALL, GREY, 0]
    base = jnp.asarray(base)

    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)

    def room_interior(i, j):
        return ((xs > i * (S - 1)) & (xs < (i + 1) * (S - 1))
                & (ys > j * (S - 1)) & (ys < (j + 1) * (S - 1)))

    def build(k):
        (k_ari, k_arj, k_apos, k_adir, k_conn, k_dist, k_tgt,
         k_lock, k_key) = jax.random.split(k, 9)
        grid = base
        open_wall0 = jnp.zeros((C, R, 4), bool)

        # BabyAI unlock tier (upstream minigrid/envs/babyai/unlock.py
        # Unlock / GoToImpUnlock — reconstructed): lock a random door of
        # a random room, key of the door's color in a DIFFERENT room,
        # agent placed outside the locked room; Unlock keeps the locked
        # color unique among connect_all doors with prob 1/2.
        L = jnp.int32(-1)
        lcolor = jnp.int32(-1)
        avoid_color = jnp.int32(-1)
        li = lj = jnp.int32(0)
        if params.locked_room:
            (k_lr, k_lw, k_lc, k_lo, k_uq) = jax.random.split(k_lock, 5)
            L = jax.random.randint(k_lr, (), 0, C * R)
            li, lj = L % C, L // C
            validd = jnp.stack([li + 1 < C, lj + 1 < R, li > 0, lj > 0])
            r = jax.random.randint(k_lw, (), 0, validd.sum())
            d = jnp.argmax(jnp.cumsum(validd) > r)
            off = jax.random.randint(k_lo, (), 1, S - 1)
            x = jnp.where(d == 0, (li + 1) * (S - 1),
                          jnp.where(d == 2, li * (S - 1),
                                    li * (S - 1) + off))
            y = jnp.where(d == 1, (lj + 1) * (S - 1),
                          jnp.where(d == 3, lj * (S - 1),
                                    lj * (S - 1) + off))
            lcolor = jax.random.randint(k_lc, (), 0, 6)
            grid = grid.at[x, y].set(
                jnp.stack([jnp.int8(DOOR), lcolor.astype(jnp.int8),
                           jnp.int8(LOCKED)]))
            dv = jnp.asarray(DIR_TO_VEC)[d]
            open_wall0 = (open_wall0.at[li, lj, d].set(True)
                          .at[li + dv[0], lj + dv[1], (d + 2) % 4]
                          .set(True))
            avoid_color = jnp.where(
                jax.random.randint(k_uq, (), 0, 2) == 1, lcolor, -1)

        if params.fixed_agent_room:
            # FindObj/PickupAbove: upstream place_agent(1, 1).
            ari = jnp.int32(params.agent_room[0])
            arj = jnp.int32(params.agent_room[1])
        elif params.locked_room:
            ar = jax.random.randint(k_ari, (), 0, C * R - 1)
            ar = ar + (ar >= L)
            ari, arj = ar % C, ar // C
        else:
            ari = jax.random.randint(k_ari, (), 0, C)
            arj = jax.random.randint(k_arj, (), 0, R)
        agent_pos = _sample_free_cell(
            k_apos, (grid[..., 0] == EMPTY) & room_interior(ari, arj))
        agent_dir = jax.random.randint(k_adir, (), 0, 4)
        if params.predoor[0] >= 0:
            # PickupAbove: a guaranteed door on one wall (random offset
            # + color) before connect_all, which then sees the rooms as
            # already joined.
            pi, pj, pd = params.predoor
            k_conn, k_pc, k_po = jax.random.split(k_conn, 3)
            off = jax.random.randint(k_po, (), 1, S - 1)
            if pd == 0:
                px, py = (pi + 1) * (S - 1), pj * (S - 1) + off
            elif pd == 2:
                px, py = pi * (S - 1), pj * (S - 1) + off
            elif pd == 1:
                px, py = pi * (S - 1) + off, (pj + 1) * (S - 1)
            else:
                px, py = pi * (S - 1) + off, pj * (S - 1)
            pcol = jax.random.randint(k_pc, (), 0, 6).astype(jnp.int8)
            grid = grid.at[px, py].set(
                jnp.stack([jnp.int8(DOOR), pcol, jnp.int8(CLOSED)]))
            ndi, ndj = DIR_TO_VEC[pd]
            open_wall0 = (open_wall0.at[pi, pj, pd].set(True)
                          .at[pi + ndi, pj + ndj, (pd + 2) % 4].set(True))

        def cond(carry):
            grid, open_wall, kk, it = carry
            return (~_rooms_reachable(open_wall)) & (it < 256)

        def body(carry):
            grid, open_wall, kk, it = carry
            kk, k_i, k_j, k_k, k_c, k_c5, k_o = jax.random.split(kk, 7)
            i = jax.random.randint(k_i, (), 0, C)
            j = jax.random.randint(k_j, (), 0, R)
            d = jax.random.randint(k_k, (), 0, 4)
            di, dj = jnp.asarray(DIR_TO_VEC)[d]
            ni, nj = i + di, j + dj
            in_range = (ni >= 0) & (ni < C) & (nj >= 0) & (nj < R)
            valid = in_range & ~open_wall[i, j, d]
            off = jax.random.randint(k_o, (), 1, S - 1)
            x = jnp.where(d == 0, (i + 1) * (S - 1),
                          jnp.where(d == 2, i * (S - 1), i * (S - 1) + off))
            y = jnp.where(d == 1, (j + 1) * (S - 1),
                          jnp.where(d == 3, j * (S - 1), j * (S - 1) + off))
            # avoid_color >= 0: connect_all(door_colors=all but the
            # locked color) — upstream Unlock's 50% uniqueness branch
            c6 = jax.random.randint(k_c, (), 0, 6)
            c5 = jax.random.randint(k_c5, (), 0, 5)
            color = jnp.where(avoid_color >= 0, c5 + (c5 >= avoid_color),
                              c6).astype(jnp.int8)
            door = jnp.stack([jnp.int8(DOOR), color, jnp.int8(CLOSED)])
            grid = jnp.where(valid, grid.at[x, y].set(door), grid)
            nc = jnp.clip(ni, 0, C - 1)
            nr = jnp.clip(nj, 0, R - 1)
            open_wall = jnp.where(
                valid,
                open_wall.at[i, j, d].set(True)
                .at[nc, nr, (d + 2) % 4].set(True),
                open_wall,
            )
            return grid, open_wall, kk, it + 1

        grid, _, _, _ = jax.lax.while_loop(
            cond, body, (grid, open_wall0, k_conn, jnp.int32(0)))

        if params.doors_open:
            is_door = grid[..., 0] == DOOR
            grid = grid.at[..., 2].set(
                jnp.where(is_door, jnp.int8(OPEN), grid[..., 2]))

        free = grid[..., 0] == EMPTY
        free = free.at[agent_pos[0], agent_pos[1]].set(False)
        if params.locked_room:
            # the matching key, in a room other than the locked one
            k_kr, k_kp = jax.random.split(k_key)
            kr = jax.random.randint(k_kr, (), 0, C * R - 1)
            kr = kr + (kr >= L)
            kpos = _sample_free_cell(
                k_kp, free & room_interior(kr % C, kr // C))
            free = free.at[kpos[0], kpos[1]].set(False)
            grid = grid.at[kpos[0], kpos[1]].set(
                jnp.stack([jnp.int8(KEY), lcolor.astype(jnp.int8),
                           jnp.int8(0)]))
        obj_types = jnp.asarray([KEY, BALL, BOX], jnp.int8)
        types = jnp.zeros((n,), jnp.int8)
        colors = jnp.zeros((n,), jnp.int8)
        for idx, kd in enumerate(jax.random.split(k_dist, n)):
            k_t, k_c, k_ri, k_rj, k_p = jax.random.split(kd, 5)
            t = obj_types[jax.random.randint(k_t, (), 0, 3)]
            c = jax.random.randint(k_c, (), 0, 6).astype(jnp.int8)
            if idx == 0 and params.obj_room[0] >= 0:
                # PickupAbove: the mission object goes in a fixed room
                # (upstream add_object(1, 0)).
                ri = jnp.int32(params.obj_room[0])
                rj = jnp.int32(params.obj_room[1])
            elif params.dists_per_room:
                # GoToImpUnlock: exactly 2 distractors per non-locked
                # room (upstream's per-room add_distractors loop).
                rr = jnp.int32(idx // 2)
                rr = rr + (rr >= L)
                ri, rj = rr % C, rr // C
            else:
                ri = jax.random.randint(k_ri, (), 0, C)
                rj = jax.random.randint(k_rj, (), 0, R)
            pos = _sample_free_cell(k_p, free & room_interior(ri, rj))
            free = free.at[pos[0], pos[1]].set(False)
            grid = grid.at[pos[0], pos[1]].set(
                jnp.stack([t, c, jnp.int8(0)]))
            types = types.at[idx].set(t)
            colors = colors.at[idx].set(c)

        if params.locked_room and params.target_in_locked:
            # GoToImpUnlock: one extra object inside the locked room is
            # the GoToInstr target (matching distractors elsewhere also
            # satisfy the desc — "possibly in a locked room").
            k_tt, k_tc, k_tp = jax.random.split(k_tgt, 3)
            tt = obj_types[jax.random.randint(k_tt, (), 0, 3)]
            tc = jax.random.randint(k_tc, (), 0, 6).astype(jnp.int8)
            tpos = _sample_free_cell(k_tp, free & room_interior(li, lj))
            grid = grid.at[tpos[0], tpos[1]].set(
                jnp.stack([tt, tc, jnp.int8(0)]))
            target = (jnp.zeros(8, jnp.int32)
                      .at[0].set(tt.astype(jnp.int32))
                      .at[1].set(tc.astype(jnp.int32)))
        elif params.locked_room:
            # Unlock: OpenInstr on the locked door's color.
            target = (jnp.zeros(8, jnp.int32)
                      .at[0].set(DOOR).at[1].set(lcolor))
        elif params.success == "babyai_open_color":
            # Open: the mission names a uniform door's color (upstream
            # open.py Open.gen_mission — a uniform element of the doors
            # list; every door is one cell, so a uniform door CELL is
            # the same draw).
            dpos = _sample_free_cell(k_tgt, grid[..., 0] == DOOR)
            target = (jnp.zeros(8, jnp.int32)
                      .at[0].set(DOOR)
                      .at[1].set(grid[dpos[0], dpos[1], 1]
                                 .astype(jnp.int32)))
        else:
            t_idx = jax.random.randint(k_tgt, (), 0, n)
            # FindObj/PickupAbove missions name the type only ("pick up
            # the ball") — the verifier's color is a wildcard.
            tcol = (jnp.int32(-1) if params.type_only
                    else colors[t_idx].astype(jnp.int32))
            target = (jnp.zeros(8, jnp.int32)
                      .at[0].set(types[t_idx].astype(jnp.int32))
                      .at[1].set(tcol))
        return grid, agent_pos, agent_dir, target

    def attempt(k):
        k, k_b = jax.random.split(k)
        grid, agent_pos, agent_dir, target = build(k_b)
        # Every family here runs the reachability rejection — including
        # Open: upstream Open.gen_mission calls check_objs_reachable()
        # right after add_distractors(18) (minigrid/envs/babyai/open.py,
        # from babyai Level_Open), so blocked layouts are resampled.
        ok = _objs_reachable(params, grid, agent_pos)
        if params.invert_reach:
            ok = ~ok
        return ok, k, grid, agent_pos, agent_dir, target

    # UnblockPickup (invert_reach) *requires* an unreachable object; a
    # higher cap (matching the connect_all bound) keeps the probability
    # of silently returning an all-reachable layout negligible. Upstream
    # retries unboundedly; 256 draws of a >=1/3 event miss with p<1e-45.
    max_attempts = 256 if params.invert_reach else 64

    def cond(c):
        return (~c[0]) & (c[-1] < max_attempts)

    def body(c):
        return attempt(c[1])[:6] + (c[-1] + 1,)

    out = jax.lax.while_loop(cond, body, attempt(key) + (jnp.int32(1),))
    _, k_next, grid, agent_pos, agent_dir, target = out[:6]
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=jax.random.split(k_next)[1],
        target=target,
    )


def _reset_babyai_putnext(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI PutNextLocal (upstream minigrid/envs/babyai/putnext.py —
    reconstructed): one room, ``num_objs`` DISTINCT (type, color)
    objects (add_distractors all_unique=True), reachability
    rejection-sampled; the mission picks an ordered pair of distinct
    objects (_rand_subset(objs, 2)) — put the first next to the
    second. Target layout: [move_type, move_color, fixed_type,
    fixed_color, 0...]."""
    k_room, k_mv, k_tgt, k_next = jax.random.split(key, 4)
    n = params.num_objs

    grid, agent_pos, agent_dir, types, colors = _babyai_room(
        params, k_room, lambda k: _distinct_objects(k, n))

    mv = jax.random.randint(k_mv, (), 0, n)
    t0 = jax.random.randint(k_tgt, (), 0, n - 1)
    tg = t0 + (t0 >= mv)
    target = (jnp.zeros(8, jnp.int32)
              .at[0].set(types[mv].astype(jnp.int32))
              .at[1].set(colors[mv].astype(jnp.int32))
              .at[2].set(types[tg].astype(jnp.int32))
              .at[3].set(colors[tg].astype(jnp.int32)))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _reset_babyai_pickup(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI PickupDist[Debug] (upstream
    minigrid/envs/babyai/pickup.py — reconstructed): one 7×7 room with
    5 DISTINCT (type, color) objects and NO reachability check
    (gen_mission never calls check_objs_reachable here); the mission
    picks one object and then restricts the description uniformly to
    its type only, its color only, or both — wildcards are −1 in the
    target layout [type|−1, color|−1, 0...]."""
    k_room, k_t, k_sel, k_next = jax.random.split(key, 4)
    n = params.num_objs

    grid, agent_pos, agent_dir, types, colors = _babyai_room(
        params, k_room, lambda k: _distinct_objects(k, n),
        check_reachable=False)

    t = jax.random.randint(k_t, (), 0, n)
    # select_by ∈ {type, color, both} uniform (pickup.py gen_mission)
    sel = jax.random.randint(k_sel, (), 0, 3)
    target = (jnp.zeros(8, jnp.int32)
              .at[0].set(jnp.where(sel == 1, -1, types[t].astype(jnp.int32)))
              .at[1].set(jnp.where(sel == 0, -1,
                                   colors[t].astype(jnp.int32))))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _reset_babyai_openred(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI OpenRedDoor (upstream minigrid/envs/babyai/open.py —
    reconstructed): RoomGrid 1 row × 2 cols of 5×5 rooms → a 9×5 grid
    with the shared wall at x=4; ``add_door(0, 0, 0, "red",
    locked=False)`` puts a closed red door at a random y of that wall,
    and the agent starts in the left room. ``EnvState.target[0]`` holds
    the door's packed position + 1 for the OpenInstr verifier."""
    k_door, k_agent, k_dir, k_next = jax.random.split(key, 4)
    grid = np.zeros((params.width, params.height, 3), np.int8)
    grid[..., 0] = EMPTY
    grid[0, :, :] = grid[-1, :, :] = [WALL, GREY, 0]
    grid[:, 0, :] = grid[:, -1, :] = [WALL, GREY, 0]
    grid[4, :, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)
    dy = jax.random.randint(k_door, (), 1, params.height - 1)
    grid = grid.at[4, dy].set(
        jnp.stack([jnp.int8(DOOR), jnp.int8(RED), jnp.int8(CLOSED)]))
    xs = jnp.arange(params.width).reshape(-1, 1)
    agent_pos = _sample_free_cell(k_agent, (grid[..., 0] == EMPTY) & (xs < 4))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=jnp.zeros(8, jnp.int32).at[0].set(4 * params.height + dy + 1),
    )


def _reset_babyai_opendoor(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI OpenDoor[Color|Loc][Debug] (upstream open.py —
    reconstructed): the default 3×3 RoomGrid of 8×8 rooms (22×22 grid,
    walls at multiples of 7); the center room gets one closed unlocked
    door per wall — east/south/west/north in that order (add_door
    door_idx 0..3) — in 4 distinct colors (_rand_subset of the 6), and
    the agent starts inside it. The mission's match set (ObjDesc via
    OpenInstr, fixed at reset like reset_verifier's find_matching_objs):
    select_by "color" → exactly the first (east) door, whose color names
    the mission; "loc" → every door on the sampled side of the agent's
    start pose (verifier.py dot-product rule: left/right sign of
    v·right-vec, front/behind sign of v·dir-vec — the door on the faced
    wall always satisfies its own side, so the set is never empty);
    unforced → uniform between the modes. Matched doors' packed
    positions + 1 fill ``EnvState.target[:4]`` (0 = unused slot)."""
    k_col, k_off, k_agent, k_dir, k_sel, k_loc, k_next = (
        jax.random.split(key, 7))
    grid = np.zeros((params.width, params.height, 3), np.int8)
    grid[..., 0] = EMPTY
    for t in range(4):
        grid[t * 7, :, :] = [WALL, GREY, 0]
        grid[:, t * 7, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)

    colors = jax.random.permutation(k_col, 6)[:4].astype(jnp.int8)
    offs = jax.random.randint(k_off, (4,), 8, 14)
    dx = jnp.stack([jnp.int32(14), offs[1], jnp.int32(7), offs[3]])
    dy = jnp.stack([offs[0], jnp.int32(14), offs[2], jnp.int32(7)])
    for i in range(4):
        grid = grid.at[dx[i], dy[i]].set(
            jnp.stack([jnp.int8(DOOR), colors[i], jnp.int8(CLOSED)]))

    xs = jnp.arange(params.width).reshape(-1, 1)
    ys = jnp.arange(params.height).reshape(1, -1)
    interior = (xs >= 8) & (xs <= 13) & (ys >= 8) & (ys <= 13)
    agent_pos = _sample_free_cell(
        k_agent, (grid[..., 0] == EMPTY) & interior)
    agent_dir = jax.random.randint(k_dir, (), 0, 4)

    sel = (jnp.int32(0) if params.select_by == "color"
           else jnp.int32(1) if params.select_by == "loc"
           else jax.random.randint(k_sel, (), 0, 2))
    loc = jax.random.randint(k_loc, (), 0, 4)  # left/right/front/behind
    d1 = jnp.asarray(DIR_TO_VEC)[agent_dir]
    d2 = jnp.asarray(DIR_TO_VEC)[(agent_dir + 1) % 4]
    v = jnp.stack([dx, dy], 1) - agent_pos            # [4, 2]
    p1, p2 = v @ d1, v @ d2
    loc_ok = jnp.stack([p2 < 0, p2 > 0, p1 > 0, p1 < 0])[loc]
    match = jnp.where(sel == 0, jnp.arange(4) == 0, loc_ok)
    packed = dx * params.height + dy + 1
    target = jnp.concatenate(
        [jnp.where(match, packed, 0), jnp.zeros(4, jnp.int32)])
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _reset_babyai_actionobj(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI ActionObjDoor (upstream minigrid/envs/babyai/other.py —
    reconstructed): 3×3 RoomGrid of 7×7 rooms, walls at multiples of 6;
    the center room (interior 7..11 both axes) holds 5 distinct
    distractors and gets one closed unlocked door per wall at a random
    offset, each in an independent random color (add_door's default —
    duplicates allowed, unlike the distractors). The agent starts
    inside. The mission draws one of the 9 objects uniformly; doors get
    GoToInstr/OpenInstr, objects GoToInstr/PickupInstr (coin flip).
    ``EnvState.target`` = [verb (0=goto, 1=pickup, 2=open), type,
    color, 0...] — GoToInstr/PickupInstr/OpenInstr all match by
    (type, color), so duplicates anywhere count (ObjDesc matches all).
    No reachability check (upstream gen_mission omits it here)."""
    (k_obj, k_place, k_dcol, k_doff, k_agent, k_dir, k_pick, k_verb,
     k_next) = jax.random.split(key, 9)
    grid = np.zeros((params.width, params.height, 3), np.int8)
    grid[..., 0] = EMPTY
    for t in range(4):
        grid[t * 6, :, :] = [WALL, GREY, 0]
        grid[:, t * 6, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)

    dcols = jax.random.randint(k_dcol, (4,), 0, 6).astype(jnp.int8)
    offs = jax.random.randint(k_doff, (4,), 7, 12)
    ddx = jnp.stack([jnp.int32(12), offs[1], jnp.int32(6), offs[3]])
    ddy = jnp.stack([offs[0], jnp.int32(12), offs[2], jnp.int32(6)])
    for i in range(4):
        grid = grid.at[ddx[i], ddy[i]].set(
            jnp.stack([jnp.int8(DOOR), dcols[i], jnp.int8(CLOSED)]))

    xs = jnp.arange(params.width).reshape(-1, 1)
    ys = jnp.arange(params.height).reshape(1, -1)
    interior = (xs >= 7) & (xs <= 11) & (ys >= 7) & (ys <= 11)
    types, colors = _distinct_objects(k_obj, params.num_objs)
    free = (grid[..., 0] == EMPTY) & interior
    agent_pos = _sample_free_cell(k_agent, free)
    free = free.at[agent_pos[0], agent_pos[1]].set(False)
    for i, kp in enumerate(jax.random.split(k_place, params.num_objs)):
        pos = _sample_free_cell(kp, free)
        free = free.at[pos[0], pos[1]].set(False)
        grid = grid.at[pos[0], pos[1]].set(
            jnp.stack([types[i], colors[i], jnp.int8(0)]))

    pick = jax.random.randint(k_pick, (), 0, params.num_objs + 4)
    is_door = pick >= params.num_objs
    di = jnp.clip(pick - params.num_objs, 0, 3)
    oi = jnp.clip(pick, 0, params.num_objs - 1)
    ttype = jnp.where(is_door, DOOR, types[oi].astype(jnp.int32))
    tcol = jnp.where(is_door, dcols[di].astype(jnp.int32),
                     colors[oi].astype(jnp.int32))
    coin = jax.random.randint(k_verb, (), 0, 2)
    verb = jnp.where(coin == 0, 0, jnp.where(is_door, 2, 1))
    target = (jnp.zeros(8, jnp.int32).at[0].set(verb)
              .at[1].set(ttype).at[2].set(tcol))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _reset_babyai_levelgen(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI LevelGen tier — GoToSeq[S5R2], Synth[S5R2], SynthLoc,
    SynthSeq, MiniBossLevel, BossLevel[NoUnlock] (upstream
    minigrid/envs/babyai/core/levelgen.py + synth.py — reconstructed).

    gen_mission: with probability ``locked_room_prob`` lock a random
    door of a random room and drop the matching key in a different room
    (add_locked_room); connect_all; ``num_objs`` distractors in random
    rooms (duplicates allowed); agent in a random non-locked room;
    check_objs_reachable only when unblocking is off
    (``check_reachable`` — GoToSeq). The instruction is rand_instr over
    ``instr_kinds``: action → one atomic instruction; and → AndInstr of
    two; seq → Before/After of two halves each drawn from
    {action, and}. Atomic descs follow rand_obj_desc: verb uniform over
    ``action_kinds``; type uniform over the verb's legal pool (goto:
    all four incl. door, open: door, pickup/putnext: movable); color
    None with prob 1/7; a location word with prob 1/2 when
    ``locations`` (evaluated against the agent's start pose, packed as
    a positional match set — capacity 6); every desc rejection-sampled
    until it matches at least one object. Putnext draws a second
    (movable) desc, resampled when both halves can only denote the same
    single object; its descs skip location words (the positional-set
    machinery tracks one desc per slot — a documented reconstruction
    narrowing).
    """
    S, R, C = params.max_room_size, params.min_rooms, params.max_rooms
    w, h = params.width, params.height
    n = params.num_objs
    i32 = jnp.int32

    base = np.zeros((w, h, 3), dtype=np.int8)
    base[..., 0] = EMPTY
    for i in range(C + 1):
        base[i * (S - 1), :, :] = [WALL, GREY, 0]
    for j in range(R + 1):
        base[:, j * (S - 1), :] = [WALL, GREY, 0]
    base = jnp.asarray(base)
    xs = jnp.arange(w).reshape(w, 1)
    ys = jnp.arange(h).reshape(1, h)

    def room_interior(i, j):
        return ((xs > i * (S - 1)) & (xs < (i + 1) * (S - 1))
                & (ys > j * (S - 1)) & (ys < (j + 1) * (S - 1)))

    def build(k):
        (k_lock, k_ar, k_apos, k_adir, k_conn, k_key, k_dist) = (
            jax.random.split(k, 7))
        grid = base
        open_wall0 = jnp.zeros((C, R, 4), bool)
        if params.locked_room_prob > 0:
            k_p, k_lr, k_lw, k_lo, k_lc = jax.random.split(k_lock, 5)
            has_lock = (jax.random.uniform(k_p)
                        < params.locked_room_prob)
            L = jax.random.randint(k_lr, (), 0, C * R)
            li, lj = L % C, L // C
            validd = jnp.stack([li + 1 < C, lj + 1 < R, li > 0, lj > 0])
            r = jax.random.randint(k_lw, (), 0, validd.sum())
            d = jnp.argmax(jnp.cumsum(validd) > r)
            off = jax.random.randint(k_lo, (), 1, S - 1)
            x = jnp.where(d == 0, (li + 1) * (S - 1),
                          jnp.where(d == 2, li * (S - 1),
                                    li * (S - 1) + off))
            y = jnp.where(d == 1, (lj + 1) * (S - 1),
                          jnp.where(d == 3, lj * (S - 1),
                                    lj * (S - 1) + off))
            lcolor = jax.random.randint(k_lc, (), 0, 6)
            grid = jnp.where(
                has_lock,
                grid.at[x, y].set(
                    jnp.stack([jnp.int8(DOOR), lcolor.astype(jnp.int8),
                               jnp.int8(LOCKED)])),
                grid)
            dv = jnp.asarray(DIR_TO_VEC)[d]
            open_wall0 = jnp.where(
                has_lock,
                open_wall0.at[li, lj, d].set(True)
                .at[li + dv[0], lj + dv[1], (d + 2) % 4].set(True),
                open_wall0)
            k_ar8, k_ar9 = jax.random.split(k_ar)
            ar8 = jax.random.randint(k_ar8, (), 0, C * R - 1)
            ar = jnp.where(has_lock, ar8 + (ar8 >= L),
                           jax.random.randint(k_ar9, (), 0, C * R))
        else:
            has_lock = jnp.bool_(False)
            L = jnp.int32(-1)
            lcolor = jnp.int32(0)
            ar = jax.random.randint(k_ar, (), 0, C * R)
        ari, arj = ar % C, ar // C
        agent_pos = _sample_free_cell(
            k_apos, (grid[..., 0] == EMPTY) & room_interior(ari, arj))
        agent_dir = jax.random.randint(k_adir, (), 0, 4)

        def cond(carry):
            return (~_rooms_reachable(carry[1])) & (carry[3] < 256)

        def body(carry):
            grid, open_wall, kk, it = carry
            kk, k_i, k_j, k_k, k_c, k_o = jax.random.split(kk, 6)
            i = jax.random.randint(k_i, (), 0, C)
            j = jax.random.randint(k_j, (), 0, R)
            d = jax.random.randint(k_k, (), 0, 4)
            di, dj = jnp.asarray(DIR_TO_VEC)[d]
            ni, nj = i + di, j + dj
            in_range = (ni >= 0) & (ni < C) & (nj >= 0) & (nj < R)
            valid = in_range & ~open_wall[i, j, d]
            off = jax.random.randint(k_o, (), 1, S - 1)
            x = jnp.where(d == 0, (i + 1) * (S - 1),
                          jnp.where(d == 2, i * (S - 1),
                                    i * (S - 1) + off))
            y = jnp.where(d == 1, (j + 1) * (S - 1),
                          jnp.where(d == 3, j * (S - 1),
                                    j * (S - 1) + off))
            color = jax.random.randint(k_c, (), 0, 6).astype(jnp.int8)
            door = jnp.stack([jnp.int8(DOOR), color, jnp.int8(CLOSED)])
            grid = jnp.where(valid, grid.at[x, y].set(door), grid)
            nc = jnp.clip(ni, 0, C - 1)
            nr = jnp.clip(nj, 0, R - 1)
            open_wall = jnp.where(
                valid,
                open_wall.at[i, j, d].set(True)
                .at[nc, nr, (d + 2) % 4].set(True),
                open_wall)
            return grid, open_wall, kk, it + 1

        grid, _, _, _ = jax.lax.while_loop(
            cond, body, (grid, open_wall0, k_conn, jnp.int32(0)))

        free = grid[..., 0] == EMPTY
        free = free.at[agent_pos[0], agent_pos[1]].set(False)
        if params.locked_room_prob > 0:
            k_kr, k_kp = jax.random.split(k_key)
            kr = jax.random.randint(k_kr, (), 0, C * R - 1)
            kr = kr + (kr >= L)
            kpos = _sample_free_cell(
                k_kp, free & room_interior(kr % C, kr // C))
            grid = jnp.where(
                has_lock,
                grid.at[kpos[0], kpos[1]].set(
                    jnp.stack([jnp.int8(KEY), lcolor.astype(jnp.int8),
                               jnp.int8(0)])),
                grid)
            free = jnp.where(
                has_lock, free.at[kpos[0], kpos[1]].set(False), free)

        obj_types = jnp.asarray([KEY, BALL, BOX], jnp.int8)
        for kd in jax.random.split(k_dist, n):
            k_t, k_c, k_ri, k_rj, k_p = jax.random.split(kd, 5)
            t = obj_types[jax.random.randint(k_t, (), 0, 3)]
            c = jax.random.randint(k_c, (), 0, 6).astype(jnp.int8)
            ri = jax.random.randint(k_ri, (), 0, C)
            rj = jax.random.randint(k_rj, (), 0, R)
            pos = _sample_free_cell(k_p, free & room_interior(ri, rj))
            free = free.at[pos[0], pos[1]].set(False)
            grid = grid.at[pos[0], pos[1]].set(
                jnp.stack([t, c, jnp.int8(0)]))
        return grid, agent_pos, agent_dir

    k, k_b = jax.random.split(key)
    if params.check_reachable:
        def attempt(kk):
            kk, kb = jax.random.split(kk)
            grid, agent_pos, agent_dir = build(kb)
            ok = _objs_reachable(params, grid, agent_pos)
            return ok, kk, grid, agent_pos, agent_dir

        out = jax.lax.while_loop(
            lambda c: (~c[0]) & (c[-1] < 64),
            lambda c: attempt(c[1])[:5] + (c[-1] + 1,),
            attempt(k_b) + (jnp.int32(1),))
        _, k, grid, agent_pos, agent_dir = out[:5]
    else:
        grid, agent_pos, agent_dir = build(k_b)

    # -- rand_instr ---------------------------------------------------------
    (k_kind, k_seq, k_ca, k_cb, k_s0, k_s1, k_s2, k_s3, k_next) = (
        jax.random.split(k, 9))
    g0 = grid[..., 0].astype(i32)
    g1 = grid[..., 1].astype(i32)
    d1 = jnp.asarray(DIR_TO_VEC)[agent_dir]
    d2 = jnp.asarray(DIR_TO_VEC)[(agent_dir + 1) % 4]
    vx = xs - agent_pos[0]
    vy = ys - agent_pos[1]
    p1 = vx * d1[0] + vy * d1[1]
    p2 = vx * d2[0] + vy * d2[1]
    loc_masks = jnp.stack([p2 < 0, p2 > 0, p1 > 0, p1 < 0])

    verb_codes = {"goto": 1, "open": 2, "pickup": 3, "putnext": 4}
    allowed = jnp.asarray(
        [verb_codes[a] for a in params.action_kinds.split(",")], i32)
    movable = jnp.asarray([KEY, BALL, BOX], i32)
    four = jnp.asarray([KEY, BALL, BOX, DOOR], i32)

    def sample_slot(kslot):
        def draw(c):
            k = c[-1]
            (k, kv, kt3, kt4, kc, kl, klv, kt2, kc2) = (
                jax.random.split(k, 9))
            verb = allowed[jax.random.randint(kv, (), 0, allowed.shape[0])]
            t3 = movable[jax.random.randint(kt3, (), 0, 3)]
            t4 = four[jax.random.randint(kt4, (), 0, 4)]
            t = jnp.where(verb == 2, DOOR, jnp.where(verb == 1, t4, t3))
            col = jax.random.randint(kc, (), -1, 6)
            loc = jnp.where(
                params.locations
                & (jax.random.randint(kl, (), 0, 2) == 1) & (verb != 4),
                jax.random.randint(klv, (), 0, 4), -1)
            mask = ((g0 == t) & ((col < 0) | (g1 == col))
                    & jnp.where(loc >= 0,
                                loc_masks[jnp.clip(loc, 0, 3)], True))
            ok = jnp.any(mask)
            t2 = movable[jax.random.randint(kt2, (), 0, 3)]
            c2 = jax.random.randint(kc2, (), -1, 6)
            mask2 = (g0 == t2) & ((c2 < 0) | (g1 == c2))
            single_same = ((mask.sum() == 1) & (mask2.sum() == 1)
                           & (jnp.argmax(mask) == jnp.argmax(mask2)))
            ok = jnp.where(verb == 4,
                           ok & jnp.any(mask2) & ~single_same, ok)
            positional = loc >= 0
            packed = jnp.where(mask, xs * h + ys + 1, 0).reshape(-1)
            top = -jnp.sort(-packed)[:6]
            row = (jnp.zeros(12, i32)
                   .at[0].set(verb)
                   .at[1].set(jnp.where(positional, -1, t))
                   .at[2].set(jnp.where(positional, -1, col))
                   .at[3].set(jnp.where(verb == 4, t2, 0))
                   .at[4].set(jnp.where(verb == 4, c2, 0))
                   .at[5].set(positional.astype(i32)))
            row = row.at[6:12].set(jnp.where(positional, top, 0))
            return ok, row, k

        init = (jnp.bool_(False), jnp.zeros(12, i32), kslot)
        # rand_obj_desc retries until the desc matches something; a bare
        # movable type always exists (num_objs >= 1), so this converges
        out = jax.lax.while_loop(lambda c: ~c[0], draw, draw(init))
        return out[1]

    kinds = params.instr_kinds.split(",")
    kind_codes = jnp.asarray(
        [{"action": 0, "and": 1, "seq": 2}[x] for x in kinds], i32)
    kindc = kind_codes[jax.random.randint(k_kind, (), 0, len(kinds))]
    comp = jnp.where(kindc == 2,
                     2 + jax.random.randint(k_seq, (), 0, 2), kindc)
    a_and = (kindc == 2) & (jax.random.randint(k_ca, (), 0, 2) == 1)
    b_and = (kindc == 2) & (jax.random.randint(k_cb, (), 0, 2) == 1)
    use = jnp.stack([jnp.bool_(True), (kindc == 1) | a_and,
                     kindc == 2, (kindc == 2) & b_and])
    rows = jnp.stack([sample_slot(ks)
                      for ks in (k_s0, k_s1, k_s2, k_s3)])
    instr = rows * use[:, None].astype(i32)

    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=jnp.zeros(8, i32).at[0].set(comp),
        instr=instr,
    )


def _reset_babyai_unlocklocal(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI UnlockLocal[Dist] / KeyInBox (upstream
    minigrid/envs/babyai/unlock.py — reconstructed): 3×3 RoomGrid of
    8×8 rooms (22×22); the center room gets one LOCKED random-color
    door on a random wall, the matching key inside the room — loose
    (UnlockLocal) or hidden in a random-color box (KeyInBox) — and the
    agent. Dist adds 3 distractors, distinct among themselves and from
    the key (add_distractors all_unique=True). Mission:
    OpenInstr(ObjDesc("door")) — type only, so ``target`` carries the
    color wildcard −1 (the center room's only door)."""
    (k_wall, k_off, k_col, k_keyp, k_box, k_dist, k_agent, k_dir,
     k_next) = jax.random.split(key, 9)
    grid = np.zeros((params.width, params.height, 3), np.int8)
    grid[..., 0] = EMPTY
    for t in range(4):
        grid[t * 7, :, :] = [WALL, GREY, 0]
        grid[:, t * 7, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)

    d = jax.random.randint(k_wall, (), 0, 4)
    off = jax.random.randint(k_off, (), 8, 14)
    dx = jnp.where(d == 0, 14, jnp.where(d == 2, 7, off))
    dy = jnp.where(d == 1, 14, jnp.where(d == 3, 7, off))
    color = jax.random.randint(k_col, (), 0, 6).astype(jnp.int8)
    grid = grid.at[dx, dy].set(
        jnp.stack([jnp.int8(DOOR), color, jnp.int8(LOCKED)]))

    xs = jnp.arange(params.width).reshape(-1, 1)
    ys = jnp.arange(params.height).reshape(1, -1)
    interior = (xs > 7) & (xs < 14) & (ys > 7) & (ys < 14)
    free = (grid[..., 0] == EMPTY) & interior
    kpos = _sample_free_cell(k_keyp, free)
    free = free.at[kpos[0], kpos[1]].set(False)
    if params.key_in_box:
        bcol = jax.random.randint(k_box, (), 0, 6).astype(jnp.int8)
        cell = jnp.stack([jnp.int8(BOX), bcol, (color + 1).astype(jnp.int8)])
    else:
        cell = jnp.stack([jnp.int8(KEY), color, jnp.int8(0)])
    grid = grid.at[kpos[0], kpos[1]].set(cell)

    if params.num_objs:
        # distinct (type, color) pairs excluding the key's pair
        ex = 0 * 6 + color.astype(jnp.int32)  # KEY row of the 3×6 table
        k_pick, k_dplace = jax.random.split(k_dist)
        perm = jax.random.permutation(k_pick, 17)[: params.num_objs]
        q = perm + (perm >= ex)
        dt = jnp.asarray([KEY, BALL, BOX], jnp.int8)[q // 6]
        dc = (q % 6).astype(jnp.int8)
        for i, kp in enumerate(jax.random.split(k_dplace, params.num_objs)):
            pos = _sample_free_cell(kp, free)
            free = free.at[pos[0], pos[1]].set(False)
            grid = grid.at[pos[0], pos[1]].set(
                jnp.stack([dt[i], dc[i], jnp.int8(0)]))

    agent_pos = _sample_free_cell(k_agent, free)
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=jnp.zeros(8, jnp.int32).at[0].set(DOOR).at[1].set(-1),
    )


def _reset_babyai_u2u(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI UnlockToUnlock (upstream unlock.py — reconstructed): three
    6×6 rooms in a row (16×6 grid, walls at x=5 and x=10); door A
    (color 1) LOCKS left↔middle, door B (color 2) LOCKS middle↔right;
    key A sits in the RIGHT room, key B in the MIDDLE, a random ball in
    the LEFT room; the agent starts in the middle. Mission:
    PickupInstr(ObjDesc("ball")) — unlock B with key B, fetch key A,
    swap keys, unlock A, pick the ball up. max_steps = 30·6²."""
    (k_cols, k_y1, k_y2, k_ka, k_kb, k_ball, k_bcol, k_agent, k_dir,
     k_next) = jax.random.split(key, 10)
    grid = np.zeros((params.width, params.height, 3), np.int8)
    grid[..., 0] = EMPTY
    grid[0, :, :] = grid[-1, :, :] = [WALL, GREY, 0]
    grid[:, 0, :] = grid[:, -1, :] = [WALL, GREY, 0]
    grid[5, :, :] = [WALL, GREY, 0]
    grid[10, :, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)

    pair = jax.random.permutation(k_cols, 6)[:2].astype(jnp.int8)
    y1 = jax.random.randint(k_y1, (), 1, params.height - 1)
    y2 = jax.random.randint(k_y2, (), 1, params.height - 1)
    grid = grid.at[5, y1].set(
        jnp.stack([jnp.int8(DOOR), pair[0], jnp.int8(LOCKED)]))
    grid = grid.at[10, y2].set(
        jnp.stack([jnp.int8(DOOR), pair[1], jnp.int8(LOCKED)]))

    xs = jnp.arange(params.width).reshape(-1, 1)
    left = xs < 5
    mid = (xs > 5) & (xs < 10)
    right = xs > 10
    free = grid[..., 0] == EMPTY

    def place(k, mask, cell):
        nonlocal grid, free
        pos = _sample_free_cell(k, free & mask)
        free = free.at[pos[0], pos[1]].set(False)
        grid = grid.at[pos[0], pos[1]].set(cell)

    place(k_ka, right, jnp.stack([jnp.int8(KEY), pair[0], jnp.int8(0)]))
    place(k_kb, mid, jnp.stack([jnp.int8(KEY), pair[1], jnp.int8(0)]))
    bcol = jax.random.randint(k_bcol, (), 0, 6).astype(jnp.int8)
    place(k_ball, left, jnp.stack([jnp.int8(BALL), bcol, jnp.int8(0)]))

    agent_pos = _sample_free_cell(k_agent, free & mid)
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=jnp.zeros(8, jnp.int32).at[0].set(BALL).at[1].set(-1),
    )


def _reset_babyai_objdoor(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI GoToDoor / GoToObjDoor (upstream
    minigrid/envs/babyai/goto.py — reconstructed): a 3×3 RoomGrid of
    ``max_room_size`` rooms; the center room gets ``num_objs``
    distractors (duplicates allowed, all_unique=False) and one closed
    unlocked door per wall at a random offset, each in an independent
    random color (add_door's default — duplicates allowed). The agent
    starts inside. The mission is always GoToInstr on a uniform draw
    over the doors (GoToDoor, num_objs=0 — "go to the {color} door",
    any door of that color matches) or over distractors + doors
    (GoToObjDoor)."""
    (k_obj, k_place, k_dcol, k_doff, k_agent, k_dir, k_pick, k_next) = (
        jax.random.split(key, 8))
    S = params.max_room_size
    W = S - 1  # wall pitch
    grid = np.zeros((params.width, params.height, 3), np.int8)
    grid[..., 0] = EMPTY
    for t in range(4):
        grid[t * W, :, :] = [WALL, GREY, 0]
        grid[:, t * W, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)

    dcols = jax.random.randint(k_dcol, (4,), 0, 6).astype(jnp.int8)
    offs = jax.random.randint(k_doff, (4,), W + 1, 2 * W)
    ddx = jnp.stack([jnp.int32(2 * W), offs[1], jnp.int32(W), offs[3]])
    ddy = jnp.stack([offs[0], jnp.int32(2 * W), offs[2], jnp.int32(W)])
    for i in range(4):
        grid = grid.at[ddx[i], ddy[i]].set(
            jnp.stack([jnp.int8(DOOR), dcols[i], jnp.int8(CLOSED)]))

    xs = jnp.arange(params.width).reshape(-1, 1)
    ys = jnp.arange(params.height).reshape(1, -1)
    interior = (xs > W) & (xs < 2 * W) & (ys > W) & (ys < 2 * W)
    free = (grid[..., 0] == EMPTY) & interior
    agent_pos = _sample_free_cell(k_agent, free)
    free = free.at[agent_pos[0], agent_pos[1]].set(False)
    n = params.num_objs
    types = jnp.zeros((max(n, 1),), jnp.int8)
    colors = jnp.zeros((max(n, 1),), jnp.int8)
    if n:
        k_t, k_c = jax.random.split(k_obj)
        types = jnp.asarray([KEY, BALL, BOX], jnp.int8)[
            jax.random.randint(k_t, (n,), 0, 3)]
        colors = jax.random.randint(k_c, (n,), 0, 6).astype(jnp.int8)
        for i, kp in enumerate(jax.random.split(k_place, n)):
            pos = _sample_free_cell(kp, free)
            free = free.at[pos[0], pos[1]].set(False)
            grid = grid.at[pos[0], pos[1]].set(
                jnp.stack([types[i], colors[i], jnp.int8(0)]))

    pick = jax.random.randint(k_pick, (), 0, n + 4)
    is_door = pick >= n
    di = jnp.clip(pick - n, 0, 3)
    oi = jnp.clip(pick, 0, max(n - 1, 0))
    ttype = jnp.where(is_door, DOOR, types[oi].astype(jnp.int32))
    tcol = jnp.where(is_door, dcols[di].astype(jnp.int32),
                     colors[oi].astype(jnp.int32))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=jnp.zeros(8, jnp.int32).at[0].set(ttype).at[1].set(tcol),
    )


def _reset_babyai_putnext2(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI PutNext[Carrying] and MoveTwoAcross (upstream
    minigrid/envs/babyai/putnext.py and other.py — reconstructed): a
    1-row × 2-col RoomGrid of ``max_room_size`` rooms with the dividing
    wall REMOVED (remove_wall(0, 0, 0) — one wide open room whose
    halves still partition object placement); ``num_objs`` objects per
    half, all 2·num_objs DISTINCT (add_distractors' all_unique spans
    every placed object).

    PutNext (success="babyai_putnext"): move a uniform left object next
    to a uniform right object, the pair flipped by a coin (upstream's
    ``if self._rand_bool(): a, b = b, a``); ``start_carrying`` lifts
    the move object off the grid into the agent's hand (upstream
    PutNext.reset()).

    MoveTwoAcross (success="babyai_seq"): BeforeInstr of two
    PutNextInstr — move a left object next to a right one, THEN a right
    object next to a left one (slots 0 and 2; comp=2)."""
    (k_obj, k_place, k_agent, k_dir, k_a, k_b, k_c, k_d, k_flip,
     k_next) = jax.random.split(key, 10)
    S = params.max_room_size
    n = params.num_objs
    grid = np.zeros((params.width, params.height, 3), np.int8)
    grid[..., 0] = EMPTY
    grid[0, :, :] = grid[-1, :, :] = [WALL, GREY, 0]
    grid[:, 0, :] = grid[:, -1, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)

    types, colors = _distinct_objects(k_obj, 2 * n)
    xs = jnp.arange(params.width).reshape(-1, 1)
    left = xs < S - 1
    right = xs > S - 1
    free = grid[..., 0] == EMPTY
    # upstream places the agent first (place_agent(0, 0) — left room)
    agent_pos = _sample_free_cell(k_agent, free & left)
    free = free.at[agent_pos[0], agent_pos[1]].set(False)
    positions = jnp.zeros((2 * n, 2), jnp.int32)
    for i, kp in enumerate(jax.random.split(k_place, 2 * n)):
        half = left if i < n else right
        pos = _sample_free_cell(kp, free & half)
        free = free.at[pos[0], pos[1]].set(False)
        grid = grid.at[pos[0], pos[1]].set(
            jnp.stack([types[i], colors[i], jnp.int8(0)]))
        positions = positions.at[i].set(pos)

    ia = jax.random.randint(k_a, (), 0, n)               # left
    ib = n + jax.random.randint(k_b, (), 0, n)           # right
    t32 = lambda v: v.astype(jnp.int32)

    if params.success == "babyai_seq":
        # MoveTwoAcross: put L[a] next to R[b], then R[c] next to L[d].
        ic = n + jax.random.randint(k_c, (), 0, n)
        idx = jax.random.randint(k_d, (), 0, n)
        row0 = (jnp.zeros(12, jnp.int32).at[0].set(4)
                .at[1].set(t32(types[ia])).at[2].set(t32(colors[ia]))
                .at[3].set(t32(types[ib])).at[4].set(t32(colors[ib])))
        row2 = (jnp.zeros(12, jnp.int32).at[0].set(4)
                .at[1].set(t32(types[ic])).at[2].set(t32(colors[ic]))
                .at[3].set(t32(types[idx])).at[4].set(t32(colors[idx])))
        instr = (jnp.zeros((4, 12), jnp.int32).at[0].set(row0)
                 .at[2].set(row2))
        return EnvState(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=jax.random.randint(k_dir, (), 0, 4),
            carrying=jnp.zeros(3, dtype=jnp.int8),
            step_count=jnp.int32(0),
            rng=k_next,
            target=jnp.zeros(8, jnp.int32).at[0].set(2),
            instr=instr,
        )

    flip = jax.random.randint(k_flip, (), 0, 2) == 1
    mv = jnp.where(flip, ib, ia)
    fx_ = jnp.where(flip, ia, ib)
    target = (jnp.zeros(8, jnp.int32)
              .at[0].set(t32(types[mv])).at[1].set(t32(colors[mv]))
              .at[2].set(t32(types[fx_])).at[3].set(t32(colors[fx_])))
    carrying = jnp.zeros(3, jnp.int8)
    if params.start_carrying:
        mp = positions[mv]
        grid = grid.at[mp[0], mp[1]].set(
            jnp.asarray([EMPTY, 0, 0], jnp.int8))
        carrying = jnp.stack([types[mv], colors[mv], jnp.int8(0)])
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=carrying,
        step_count=jnp.int32(0),
        rng=k_next,
        target=target,
    )


def _reset_babyai_twodoors(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI OpenTwoDoors / OpenRedBlueDoors / OpenDoorsOrderN{2,4}
    [Debug] (upstream minigrid/envs/babyai/open.py — reconstructed):
    3×3 RoomGrid of 6×6 rooms (16×16); the center room gets doors of
    DISTINCT colors (_rand_subset of the 6).

    OpenTwoDoors (comp="before"): door 1 on the west wall, door 2 on
    the east wall ("facing opposite directions, so that the agent can't
    see whether the door behind him is open" — needs memory); colors
    forced by ``first_color``/``second_color`` (OpenRedBlueDoors:
    red/blue) or a random distinct pair. Mission: BeforeInstr(
    OpenInstr(door1, strict=Debug), OpenInstr(door2)).

    OpenDoorsOrder (comp=""): ``num_objs`` ∈ {2, 4} doors on distinct
    random walls; an ordered distinct pair (door1, door2) and a uniform
    per-episode mode — open door1; open door1 then door2 (before); open
    door1 after door2 (after). Debug stricts both OpenInstrs."""
    (k_col, k_off, k_wall, k_agent, k_dir, k_pair, k_mode, k_next) = (
        jax.random.split(key, 8))
    grid = np.zeros((params.width, params.height, 3), np.int8)
    grid[..., 0] = EMPTY
    for t in range(4):
        grid[t * 5, :, :] = [WALL, GREY, 0]
        grid[:, t * 5, :] = [WALL, GREY, 0]
    grid = jnp.asarray(grid)

    colors = jax.random.permutation(k_col, 6).astype(jnp.int8)
    if params.first_color >= 0:
        colors = colors.at[0].set(jnp.int8(params.first_color))
        colors = colors.at[1].set(jnp.int8(params.second_color))
    offs = jax.random.randint(k_off, (4,), 6, 10)
    # wall w: 0=east, 1=south, 2=west, 3=north of the center room
    wx = jnp.stack([jnp.int32(10), offs[1], jnp.int32(5), offs[3]])
    wy = jnp.stack([offs[0], jnp.int32(10), offs[2], jnp.int32(5)])

    strict = jnp.int32(2 if params.strict else 0)
    if params.comp == "before":
        # OpenTwoDoors: west then east, both doors always present
        walls = jnp.asarray([2, 0], jnp.int32)
        n_doors = 2
        comp = jnp.int32(2)
        order = jnp.asarray([0, 1], jnp.int32)
        # upstream stricts only the FIRST OpenInstr (the Debug flag)
        strict2 = jnp.int32(0)
    else:
        n_doors = params.num_objs
        walls = jax.random.permutation(k_wall, 4)[:n_doors]
        pair = jax.random.permutation(k_pair, n_doors)[:2]
        order = pair.astype(jnp.int32)
        mode = jax.random.randint(k_mode, (), 0, 3)
        comp = jnp.asarray([0, 2, 3], jnp.int32)[mode]
        strict2 = strict

    for i in range(n_doors):
        grid = grid.at[wx[walls[i]], wy[walls[i]]].set(
            jnp.stack([jnp.int8(DOOR), colors[i], jnp.int8(CLOSED)]))

    xs = jnp.arange(params.width).reshape(-1, 1)
    ys = jnp.arange(params.height).reshape(1, -1)
    interior = (xs > 5) & (xs < 10) & (ys > 5) & (ys < 10)
    agent_pos = _sample_free_cell(
        k_agent, (grid[..., 0] == EMPTY) & interior)

    c1 = colors[order[0]].astype(jnp.int32)
    c2 = colors[order[1]].astype(jnp.int32)
    row0 = (jnp.zeros(12, jnp.int32).at[0].set(2).at[1].set(DOOR)
            .at[2].set(c1).at[5].set(strict))
    row2 = (jnp.zeros(12, jnp.int32).at[0].set(2).at[1].set(DOOR)
            .at[2].set(c2).at[5].set(strict2))
    # comp 0 (single): only slot 0 is verified; slot 2 stays absent
    instr = jnp.zeros((4, 12), jnp.int32).at[0].set(row0)
    instr = jnp.where(comp >= 2, instr.at[2].set(row2), instr)
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jax.random.randint(k_dir, (), 0, 4),
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=jnp.zeros(8, jnp.int32).at[0].set(comp),
        instr=instr,
    )


def _reset_babyai_pickuploc(params: EnvParams, key: jax.Array) -> EnvState:
    """BabyAI PickupLoc (upstream minigrid/envs/babyai/pickup.py —
    PickupLoc = LevelGen(action_kinds=["pickup"], instr_kinds=
    ["action"], num_rows=num_cols=1, num_dists=8, locations=True,
    unblocking=False) — reconstructed): one 8×8 room, 8 distractors
    (duplicates allowed), reachability rejection (unblocking=False →
    check_objs_reachable). The instruction is a PickupInstr over a
    rejection-sampled ObjDesc: uniform type, color ∈ {none} ∪ 6 colors,
    and — locations=True — a location word with probability 1/2,
    resampled until the description matches at least one object
    (rand_obj_desc's loop). Location filtering follows verifier.py's
    dot-product rule against the agent's START pose and packs the
    matching positions into the instruction slot (positional set);
    location-free descriptions match dynamically by type/color."""
    k_room, k_desc, k_next = jax.random.split(key, 3)
    n = params.num_objs

    def sample_objs(k):
        k_t, k_c = jax.random.split(k)
        types = jnp.asarray([KEY, BALL, BOX], jnp.int8)[
            jax.random.randint(k_t, (n,), 0, 3)]
        colors = jax.random.randint(k_c, (n,), 0, 6).astype(jnp.int8)
        return types, colors

    grid, agent_pos, agent_dir, types, colors = _babyai_room(
        params, k_room, sample_objs)

    g0 = grid[..., 0].astype(jnp.int32)
    g1 = grid[..., 1].astype(jnp.int32)
    xs = jnp.arange(params.width).reshape(-1, 1)
    ys = jnp.arange(params.height).reshape(1, -1)
    d1 = jnp.asarray(DIR_TO_VEC)[agent_dir]
    d2 = jnp.asarray(DIR_TO_VEC)[(agent_dir + 1) % 4]
    vx = xs - agent_pos[0]
    vy = ys - agent_pos[1]
    p1 = vx * d1[0] + vy * d1[1]
    p2 = vx * d2[0] + vy * d2[1]
    loc_masks = jnp.stack([p2 < 0, p2 > 0, p1 > 0, p1 < 0])  # l/r/f/b

    obj_types = jnp.asarray([KEY, BALL, BOX], jnp.int32)

    def sample_desc(c):
        _, _, _, k = c
        k, k_t, k_c, k_l, k_lv = jax.random.split(k, 5)
        t = obj_types[jax.random.randint(k_t, (), 0, 3)]
        col = jax.random.randint(k_c, (), -1, 6)
        loc = jnp.where(jax.random.randint(k_l, (), 0, 2) == 1,
                        jax.random.randint(k_lv, (), 0, 4), -1)
        mask = (g0 == t) & ((col < 0) | (g1 == col))
        mask = mask & jnp.where(loc >= 0, loc_masks[jnp.clip(loc, 0, 3)],
                                True)
        ok = jnp.any(mask)
        return ok, jnp.stack([t, col, loc]), mask, k

    def cond(c):
        return ~c[0]

    # rand_obj_desc retries unboundedly; a type always matching some
    # object exists, so this terminates with probability 1 (the jitted
    # while_loop mirrors the other rejection samplers in this module).
    init = (jnp.bool_(False), jnp.zeros(3, jnp.int32),
            jnp.zeros_like(g0, bool), k_desc)
    _, desc, mask, _ = jax.lax.while_loop(
        cond, sample_desc, sample_desc(init))

    packed = jnp.where(mask, xs * params.height + ys + 1, 0).reshape(-1)
    top = -jnp.sort(-packed)[:6]  # up to 6 matching positions
    positional = desc[2] >= 0
    row0 = (jnp.zeros(12, jnp.int32).at[0].set(3)
            .at[1].set(jnp.where(positional, -1, desc[0]))
            .at[2].set(jnp.where(positional, -1, desc[1]))
            .at[5].set(jnp.where(positional, 1, 0)))
    row0 = row0.at[6:12].set(jnp.where(positional, top, 0))
    return EnvState(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        carrying=jnp.zeros(3, dtype=jnp.int8),
        step_count=jnp.int32(0),
        rng=k_next,
        target=jnp.zeros(8, jnp.int32),
        instr=jnp.zeros((4, 12), jnp.int32).at[0].set(row0),
    )


@partial(jax.jit, static_argnames=("params",))
def reset(params: EnvParams, key: jax.Array) -> EnvState:
    if params.kind == "empty":
        return _reset_empty(params, key)
    if params.kind == "doorkey":
        return _reset_doorkey(params, key)
    if params.kind == "fourrooms":
        return _reset_fourrooms(params, key)
    if params.kind == "lavagap":
        return _reset_lavagap(params, key)
    if params.kind == "multiroom":
        return _reset_multiroom(params, key)
    if params.kind == "crossing":
        return _reset_crossing(params, key)
    if params.kind == "unlock":
        return _reset_unlock(params, key)
    if params.kind == "keycorridor":
        return _reset_keycorridor(params, key)
    if params.kind == "dynobs":
        return _reset_dynobs(params, key)
    if params.kind == "distshift":
        return _reset_distshift(params, key)
    if params.kind == "redblue":
        return _reset_redblue(params, key)
    if params.kind == "lockedroom":
        return _reset_lockedroom(params, key)
    if params.kind == "obstructedfull":
        return _reset_obstructedfull(params, key)
    if params.kind == "playground":
        return _reset_playground(params, key)
    if params.kind == "memory":
        return _reset_memory(params, key)
    if params.kind == "gotodoor":
        return _reset_gotodoor(params, key)
    if params.kind == "fetch":
        return _reset_fetch(params, key)
    if params.kind == "gotoobject":
        return _reset_gotoobject(params, key)
    if params.kind == "babyai_goto":
        return _reset_babyai_goto(params, key)
    if params.kind == "babyai_gotomaze":
        return _reset_babyai_gotomaze(params, key)
    if params.kind == "babyai_putnext":
        return _reset_babyai_putnext(params, key)
    if params.kind == "babyai_pickup":
        return _reset_babyai_pickup(params, key)
    if params.kind == "babyai_openred":
        return _reset_babyai_openred(params, key)
    if params.kind == "babyai_opendoor":
        return _reset_babyai_opendoor(params, key)
    if params.kind == "babyai_actionobj":
        return _reset_babyai_actionobj(params, key)
    if params.kind == "babyai_objdoor":
        return _reset_babyai_objdoor(params, key)
    if params.kind == "babyai_unlocklocal":
        return _reset_babyai_unlocklocal(params, key)
    if params.kind == "babyai_levelgen":
        return _reset_babyai_levelgen(params, key)
    if params.kind == "babyai_u2u":
        return _reset_babyai_u2u(params, key)
    if params.kind == "babyai_putnext2":
        return _reset_babyai_putnext2(params, key)
    if params.kind == "babyai_twodoors":
        return _reset_babyai_twodoors(params, key)
    if params.kind == "babyai_pickuploc":
        return _reset_babyai_pickuploc(params, key)
    if params.kind == "putnear":
        return _reset_putnear(params, key)
    raise ValueError(params.kind)


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------


def _can_overlap(cell: jax.Array) -> jax.Array:
    obj, state = cell[0], cell[2]
    return (
        (obj == EMPTY) | (obj == FLOOR) | (obj == GOAL) | (obj == LAVA)
        | ((obj == DOOR) & (state == OPEN))
    )


def _move_obstacles(params: EnvParams, state: EnvState):
    """Dynamic-Obstacles pre-step: each ball moves to a uniformly random
    free cell of its 3×3 neighborhood (own cell and the agent's excluded,
    like upstream's ``place_obj(top=old-1, size=(3,3))`` rejection loop);
    a fully blocked ball stays. Balls move sequentially, seeing earlier
    balls' new positions (upstream dynamicobstacles.py step()). Returns
    (grid, new_rng)."""
    grid = state.grid
    rng, k_all = jax.random.split(state.rng)
    w, h = params.width, params.height
    ball_cell = jnp.stack([jnp.int8(BALL), jnp.int8(BLUE), jnp.int8(0)])
    empty_cell = jnp.asarray([EMPTY, 0, 0], dtype=jnp.int8)
    # Ball identities don't matter (identical objects): recover positions
    # from the grid in scan order each step.
    flat_is_ball = (grid[..., 0] == BALL).reshape(-1)
    (ball_idx,) = jnp.nonzero(flat_is_ball, size=params.n_obstacles,
                              fill_value=0)
    offs = jnp.asarray(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], jnp.int32
    )
    for i, k in enumerate(jax.random.split(k_all, params.n_obstacles)):
        bx, by = ball_idx[i] // h, ball_idx[i] % h
        cand = jnp.stack([bx, by]) + offs                      # [9, 2]
        cx = jnp.clip(cand[:, 0], 0, w - 1)
        cy = jnp.clip(cand[:, 1], 0, h - 1)
        in_bounds = (cand[:, 0] == cx) & (cand[:, 1] == cy)
        valid = (
            in_bounds
            & (grid[cx, cy, 0] == EMPTY)
            & ~((cx == state.agent_pos[0]) & (cy == state.agent_pos[1]))
        )
        any_valid = valid.any()
        logits = jnp.where(valid, 0.0, -jnp.inf)
        # all-invalid logits would NaN the categorical; select a dummy
        pick = jax.random.categorical(k, jnp.where(any_valid, logits, 0.0))
        nx = jnp.where(any_valid, cx[pick], bx)
        ny = jnp.where(any_valid, cy[pick], by)
        grid = grid.at[bx, by].set(
            jnp.where(any_valid, empty_cell, grid[bx, by])
        )
        grid = grid.at[nx, ny].set(ball_cell)
    return grid, rng


def _seq_verify(
    params: EnvParams,
    state: EnvState,
    action: jax.Array,
    grid: jax.Array,
    new_pos: jax.Array,
    new_dir: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    fobj: jax.Array,
    fcol: jax.Array,
    does_pickup: jax.Array,
    does_drop: jax.Array,
    carrying: jax.Array,
):
    """The BabyAI composite-instruction verifier (success="babyai_seq").

    Emulates upstream minigrid/envs/babyai/core/verifier.py —
    reconstructed — for instruction trees up to Seq(And(a,b), And(c,d)):
    ``RoomGridLevel.step`` calls ``instrs.verify(action)`` after every
    transition; AndInstr verifies each not-yet-successful child and
    latches its status; BeforeInstr verifies A until it succeeds, then B
    — and in NON-STRICT mode also calls ``instr_b.verify(action)`` every
    step pre-A (upstream verifier.py's ``self.b_done =
    self.instr_b.verify(action)`` in the else branch), so an
    And-composed B half accumulates its internal done latches before A
    completes; a SINGLE-instruction B half does not persist (upstream
    overwrites ``b_done`` with the fresh verify result each step, so a
    pre-A success survives exactly one step — a narrowing here: we treat
    it as not persisting at all). In strict mode completing B first
    fails. AfterInstr mirrors it with B first. Child failures propagate
    only from the half currently being verified (upstream records but
    does not return the pre-gate half's failure). Success → time-scaled
    reward; failure → terminate with 0.

    Atomic verifiers per slot (row layout in ``EnvState.instr``):
    goto — post-step front cell matches, with the r3 stale-entry pickup
    nuance; open — toggle leaving a matching front door open (strict
    fails other front-door toggles); pickup — an actual pickup that
    leaves the agent carrying a match (strict fails pickup actions that
    hold a non-match, including re-picking a match already carried —
    upstream's ``preCarrying`` guard routes that to the strict branch);
    putnext — a drop action with a move-desc object cardinally adjacent
    to a fixed-desc object.

    Positional match sets (flag bit 0; loc-filtered ObjDesc, fixed
    against the agent's START pose like ``reset_verifier``): goto/open
    match packed front positions against the set; a pickup FROM a
    tracked position marks the carry (upstream's object-identity
    ``obj_set``), drop ACTIONS re-sync like ``update_objs_poss`` — the
    stale pickup position is dropped from the set and a successful drop
    of the tracked object adds its landing cell (capacity 6; overflow
    silently drops a position, upstream is unbounded).

    Returns (success, failure, new_instr, new_instr_state).
    """
    instr = state.instr
    verbs = instr[:, 0]
    ta, ca = instr[:, 1], instr[:, 2]
    tb, cb = instr[:, 3], instr[:, 4]
    positional = (instr[:, 5] & 1) == 1
    strict = (instr[:, 5] & 2) == 2                # per-ActionInstr strict
    pos_set = instr[:, 6:12]                       # [4, 6] packed+1
    comp = state.target[0]
    seq_strict = state.target[1] > 0               # SeqInstr strict
    H = params.height
    i32 = jnp.int32

    def match(t_arr, c_arr, otype, ocol):
        return (((t_arr < 0) | (otype.astype(i32) == t_arr))
                & ((c_arr < 0) | (ocol.astype(i32) == c_arr)))

    # -- atomic statuses this step ---------------------------------------
    dir_vec = jnp.asarray(DIR_TO_VEC)
    new_fwd = new_pos + dir_vec[new_dir]
    nfx = jnp.clip(new_fwd[0], 0, params.width - 1)
    nfy = jnp.clip(new_fwd[1], 0, params.height - 1)
    ncell = grid[nfx, nfy]
    front_packed = nfx * H + nfy + 1
    fxy_packed = fx * H + fy + 1

    goto_desc = (match(ta, ca, ncell[0], ncell[1])
                 | (does_pickup & match(ta, ca, fobj, fcol)))
    goto_succ = jnp.where(
        positional, jnp.any(pos_set == front_packed, axis=1), goto_desc)

    cell = grid[fx, fy]
    open_ok = (action == A_TOGGLE) & (cell[0] == DOOR) & (cell[2] == OPEN)
    open_succ = open_ok & jnp.where(
        positional, jnp.any(pos_set == fxy_packed, axis=1),
        match(ta, ca, jnp.int8(DOOR), cell[1]))
    open_fail = (strict & (action == A_TOGGLE) & (cell[0] == DOOR)
                 & ~open_succ)

    carry_from_set = does_pickup & jnp.any(pos_set == fxy_packed, axis=1)
    pick_succ = jnp.where(
        positional, carry_from_set,
        does_pickup & match(ta, ca, carrying[0], carrying[1]))
    pick_fail = (strict & (action == A_PICKUP) & (carrying[0] != 0)
                 & ~pick_succ)

    g0 = grid[..., 0].astype(i32)
    g1 = grid[..., 1].astype(i32)
    ta3, ca3 = ta[:, None, None], ca[:, None, None]
    tb3, cb3 = tb[:, None, None], cb[:, None, None]
    isa = (((ta3 < 0) | (g0[None] == ta3)) & ((ca3 < 0) | (g1[None] == ca3))
           & (g0[None] != WALL) & (g0[None] != EMPTY))
    isb = (((tb3 < 0) | (g0[None] == tb3)) & ((cb3 < 0) | (g1[None] == cb3))
           & (g0[None] != WALL) & (g0[None] != EMPTY))
    near_b = (jnp.roll(isb, 1, 1) | jnp.roll(isb, -1, 1)
              | jnp.roll(isb, 1, 2) | jnp.roll(isb, -1, 2))
    put_succ = (action == A_DROP) & jnp.any(isa & near_b, axis=(1, 2))

    succ_step = jnp.select(
        [verbs == 1, verbs == 2, verbs == 3, verbs == 4],
        [goto_succ, open_succ, pick_succ, put_succ], False)
    fail_step = jnp.select(
        [verbs == 2, verbs == 3], [open_fail, pick_fail], False)

    # -- positional tracking (runs on the ACTION, like update_objs_poss) --
    carry_pos = state.instr_state[:, 1]
    new_carry = jnp.where(carry_from_set & (carry_pos == 0),
                          fxy_packed, carry_pos)
    drop_action = action == A_DROP
    set_after = jnp.where(
        drop_action & (carry_pos[:, None] > 0)
        & (pos_set == carry_pos[:, None]),
        0, pos_set)
    empty = set_after == 0
    first_empty = jnp.argmax(empty, axis=1)
    should_add = does_drop & (new_carry > 0)
    set_after = jnp.where(
        should_add[:, None]
        & (jnp.arange(6)[None, :] == first_empty[:, None]) & empty,
        fxy_packed, set_after)
    new_carry = jnp.where(does_drop, 0, new_carry)
    new_instr = instr.at[:, 6:12].set(set_after)

    # -- composition over the done latches --------------------------------
    present = verbs > 0
    d = state.instr_state[:, 0] > 0
    slot = jnp.arange(4)

    def group_done(dv, lo):
        return ((dv[lo] | ~present[lo]) & (dv[lo + 1] | ~present[lo + 1]))

    def gated(dv, gate_mask):
        """And-group verification: update undone gated slots' latches;
        their failures propagate (already-done slots are skipped)."""
        nd = dv | (gate_mask & ~dv & succ_step & present)
        gfail = gate_mask & ~dv & fail_step & present
        return nd, gfail

    A_was = group_done(d, 0)
    B_was = group_done(d, 2)
    in_A = slot < 2
    in_B = slot >= 2

    # comp 0/1: single (slot 0) / and (slots 0-1) — verified until done;
    # the absent slot's ``present`` mask makes the shared gate harmless
    nd_and, gf_and = gated(d, in_A)
    succ_01 = group_done(nd_and, 0)
    fail_01 = jnp.any(gf_and)

    # Upstream non-strict Before/After verify the pre-gate half every
    # step too, so an AND-COMPOSED pre-gate half accumulates its
    # internal latches before the gate opens (single-instr halves don't
    # persist — upstream overwrites b_done each step; see docstring).
    a_is_and = present[0] & present[1]
    b_is_and = present[2] & present[3]

    # comp 2: before(A, B)
    gA = in_A & ~A_was
    nd_b, gfA = gated(d, gA)
    A_now = group_done(nd_b, 0)
    gB = in_B & (A_was | A_now | seq_strict | b_is_and)
    nd_b, gfB = gated(nd_b, gB)
    B_now = group_done(nd_b, 2)
    succ_before = (A_was | A_now) & B_now
    fail_before = (jnp.where(A_was, jnp.any(gfB), jnp.any(gfA))
                   | (seq_strict & ~A_was & ~A_now & B_now))

    # comp 3: after(A, B) — B first
    gB3 = in_B & ~B_was
    nd_a, gfB3 = gated(d, gB3)
    B_now3 = group_done(nd_a, 2)
    gA3 = in_A & (B_was | B_now3 | seq_strict | a_is_and)
    nd_a, gfA3 = gated(nd_a, gA3)
    A_now3 = group_done(nd_a, 0)
    succ_after = (B_was | B_now3) & A_now3
    fail_after = (jnp.where(B_was, jnp.any(gfA3), jnp.any(gfB3))
                  | (seq_strict & ~B_was & ~B_now3 & A_now3))

    is_seq = comp >= 2
    is_after = comp == 3
    succ = jnp.where(is_seq, jnp.where(is_after, succ_after, succ_before),
                     succ_01)
    fail = jnp.where(is_seq, jnp.where(is_after, fail_after, fail_before),
                     fail_01)
    new_d = jnp.where(is_seq, jnp.where(is_after, nd_a, nd_b), nd_and)
    new_instr_state = jnp.stack(
        [new_d.astype(i32), new_carry.astype(i32)], axis=1)
    return succ, fail, new_instr, new_instr_state


@partial(jax.jit, static_argnames=("params",))
def step(
    params: EnvParams, state: EnvState, action: jax.Array
) -> tuple[EnvState, jax.Array, jax.Array, jax.Array]:
    """One environment transition. Returns (state, reward, terminated, truncated)."""
    action = action.astype(jnp.int32)
    step_count = state.step_count + 1

    if params.success == "memory":
        # Upstream MemoryEnv.step remaps pickup → toggle before the
        # transition so the fork objects cannot be picked up.
        action = jnp.where(action == A_PICKUP, A_TOGGLE, action)

    if params.kind == "dynobs":
        # Upstream wraps out-of-range actions to 0 (the 3-action space).
        action = jnp.where(action >= params.num_actions, 0, action)
        # Collision check uses the PRE-move grid: forward into ANY
        # occupied non-goal cell (walls included — upstream quirk)
        # terminates with −1 after the normal transition.
        pre_fwd = state.agent_pos + jnp.asarray(DIR_TO_VEC)[state.agent_dir]
        pfx = jnp.clip(pre_fwd[0], 0, params.width - 1)
        pfy = jnp.clip(pre_fwd[1], 0, params.height - 1)
        pre_obj = state.grid[pfx, pfy, 0]
        not_clear = (pre_obj != EMPTY) & (pre_obj != GOAL)
        grid, rng = _move_obstacles(params, state)
        state = dataclasses.replace(state, grid=grid, rng=rng)

    dir_vec = jnp.asarray(DIR_TO_VEC)
    agent_dir = state.agent_dir
    fwd = state.agent_pos + dir_vec[agent_dir]
    fx = jnp.clip(fwd[0], 0, params.width - 1)
    fy = jnp.clip(fwd[1], 0, params.height - 1)
    fwd_cell = state.grid[fx, fy]
    fobj, fcol, fstate = fwd_cell[0], fwd_cell[1], fwd_cell[2]

    # -- turn
    new_dir = jnp.where(
        action == A_LEFT, (agent_dir - 1) % 4,
        jnp.where(action == A_RIGHT, (agent_dir + 1) % 4, agent_dir),
    )

    # -- forward
    moves = (action == A_FORWARD) & _can_overlap(fwd_cell)
    new_pos = jnp.where(moves, fwd, state.agent_pos)
    reached_goal = (action == A_FORWARD) & (fobj == GOAL)
    hit_lava = (action == A_FORWARD) & (fobj == LAVA)
    terminated = reached_goal | hit_lava
    reward = jnp.where(
        reached_goal,
        1.0 - 0.9 * (step_count.astype(jnp.float32) / params.max_steps),
        0.0,
    )

    # -- pickup
    can_pickup = (fobj == KEY) | (fobj == BALL) | (fobj == BOX)
    does_pickup = (action == A_PICKUP) & can_pickup & (state.carrying[0] == 0)
    # -- drop
    does_drop = (action == A_DROP) & (fobj == EMPTY) & (state.carrying[0] != 0)
    # -- toggle: doors open/close/unlock; boxes are replaced by their
    # contents — or vanish when empty (upstream minigrid Box.toggle:
    # `env.grid.set(*pos, self.contains)`). A hidden key is encoded in
    # the box's otherwise-unused state channel as 1 + key_color
    # (0 = empty box), so UnlockPickup's box disappears if toggled,
    # exactly like upstream.
    is_door = fobj == DOOR
    has_matching_key = (state.carrying[0] == KEY) & (state.carrying[1] == fcol)
    unlocks = is_door & (fstate == LOCKED) & has_matching_key
    opens = is_door & (fstate == CLOSED)
    closes = is_door & (fstate == OPEN)
    new_door_state = jnp.where(
        unlocks | opens, OPEN, jnp.where(closes, CLOSED, fstate)
    ).astype(jnp.int8)
    does_toggle = (action == A_TOGGLE) & is_door
    does_toggle_box = (action == A_TOGGLE) & (fobj == BOX)

    empty_cell = jnp.asarray([EMPTY, 0, 0], dtype=jnp.int8)
    toggled_cell = fwd_cell.at[2].set(new_door_state)
    box_contents = jnp.where(
        fstate > 0,
        jnp.stack([jnp.int8(KEY), (fstate - 1).astype(jnp.int8),
                   jnp.int8(0)]),
        empty_cell,
    )
    new_fwd_cell = jnp.where(
        does_pickup,
        empty_cell,
        jnp.where(
            does_drop,
            state.carrying,
            jnp.where(
                does_toggle,
                toggled_cell,
                jnp.where(does_toggle_box, box_contents, fwd_cell),
            ),
        ),
    )
    grid = state.grid.at[fx, fy].set(new_fwd_cell)

    if params.success == "open_door":
        # Unlock semantics: a toggle that leaves the door open terminates
        # with the time-scaled reward; there is no goal square
        # (upstream minigrid/envs/unlock.py step()).
        opened = does_toggle & (new_door_state == OPEN)
        terminated = opened | hit_lava
        reward = jnp.where(
            opened,
            1.0 - 0.9 * (step_count.astype(jnp.float32) / params.max_steps),
            0.0,
        )
    elif params.success == "pickup_box":
        # UnlockPickup semantics: picking the box up terminates with the
        # time-scaled reward (upstream unlockpickup.py step()).
        got_box = does_pickup & (fobj == BOX)
        terminated = got_box | hit_lava
        reward = jnp.where(
            got_box,
            1.0 - 0.9 * (step_count.astype(jnp.float32) / params.max_steps),
            0.0,
        )
    elif params.success == "pickup_ball":
        # KeyCorridor / ObstructedMaze semantics: picking the target
        # ball up terminates with the time-scaled reward (upstream
        # keycorridor.py / obstructedmaze.py step()). ``target_color``
        # disambiguates when a non-target ball exists (ObstructedMaze's
        # door blocker); KeyCorridor's ball is the only one, so any
        # color matches.
        got_ball = does_pickup & (fobj == BALL)
        if params.target_color >= 0:
            got_ball = got_ball & (fcol == params.target_color)
        terminated = got_ball | hit_lava
        reward = jnp.where(
            got_ball,
            1.0 - 0.9 * (step_count.astype(jnp.float32) / params.max_steps),
            0.0,
        )
    elif params.success == "red_then_blue":
        # RedBlueDoors semantics (upstream redbluedoors.py step()): the
        # episode ends whenever the blue door is open after the
        # transition — with the time-scaled reward iff the red door was
        # open BEFORE it; opening red while blue was already open also
        # terminates with 0 (dead in practice: a blue-open state never
        # survives a step).
        def _open(g, color):
            return jnp.any(
                (g[..., 0] == DOOR) & (g[..., 1] == color)
                & (g[..., 2] == OPEN)
            )

        red_before = _open(state.grid, RED)
        blue_before = _open(state.grid, BLUE)
        red_after = _open(grid, RED)
        blue_after = _open(grid, BLUE)
        success = blue_after & red_before
        failure = (blue_after & ~red_before) | (
            red_after & ~red_before & blue_before
        )
        terminated = success | failure
        reward = jnp.where(
            success,
            1.0 - 0.9 * (step_count.astype(jnp.float32) / params.max_steps),
            0.0,
        )

    carrying = jnp.where(
        does_pickup, fwd_cell, jnp.where(does_drop, empty_cell * 0, state.carrying)
    )

    time_reward = 1.0 - 0.9 * (step_count.astype(jnp.float32)
                               / params.max_steps)
    if params.success == "goto_door":
        # GoToDoor semantics (upstream gotodoor.py step — reconstructed):
        # any toggle terminates with 0 ("don't let the agent open the
        # doors"); ``done`` terminates, rewarded iff the agent is axially
        # adjacent to the target door (same x within |Δy| < 2, or same y
        # within |Δx| < 2).
        tx, ty = state.target[2], state.target[3]
        adjacent = ((new_pos[0] == tx) & (jnp.abs(new_pos[1] - ty) < 2)) | (
            (new_pos[1] == ty) & (jnp.abs(new_pos[0] - tx) < 2))
        terminated = terminated | (action == A_TOGGLE) | (action == A_DONE)
        reward = jnp.where((action == A_DONE) & adjacent, time_reward, reward)
    elif params.success == "fetch":
        # Fetch semantics (upstream fetch.py step — reconstructed): the
        # step after which the agent carries ANYTHING terminates — with
        # the time-scaled reward iff the carried (type, color) matches
        # the mission target.
        has = carrying[0] != 0
        match = (carrying[0].astype(jnp.int32) == state.target[0]) & (
            carrying[1].astype(jnp.int32) == state.target[1])
        terminated = terminated | has
        reward = jnp.where(has & match, time_reward, reward)
    elif params.success == "goto_object":
        # GoToObject semantics (upstream gotoobject.py step —
        # reconstructed): toggle terminates with 0; ``done`` terminates,
        # rewarded iff the agent is within Chebyshev distance 1 of the
        # target object's reset-time position.
        near = (jnp.abs(new_pos[0] - state.target[2]) <= 1) & (
            jnp.abs(new_pos[1] - state.target[3]) <= 1)
        terminated = terminated | (action == A_TOGGLE) | (action == A_DONE)
        reward = jnp.where((action == A_DONE) & near, time_reward, reward)
    elif params.success == "memory":
        # MemoryEnv semantics (upstream memory.py step — reconstructed):
        # standing on the cell in front of the matching fork object
        # terminates with the time-scaled reward; the other side's cell
        # terminates with 0. Checked post-transition on the new position.
        on_success = (new_pos[0] == state.target[0]) & (
            new_pos[1] == state.target[1])
        on_failure = (new_pos[0] == state.target[2]) & (
            new_pos[1] == state.target[3])
        terminated = terminated | on_success | on_failure
        reward = jnp.where(on_success, time_reward,
                           jnp.where(on_failure, 0.0, reward))
    elif params.success == "babyai_goto":
        # BabyAI GoToInstr (upstream
        # minigrid/envs/babyai/core/verifier.py GoToInstr.verify_action,
        # called from RoomGridLevel.step on EVERY action — reconstructed):
        # success iff the agent's post-transition front cell holds an
        # object matching the mission (type, color); any matching
        # duplicate counts (ObjDesc matches all). The verifier's position
        # list is grid-refreshed at reset and on drop, and a pickup
        # leaves the stale entry in it — so picking a matching object up
        # (only possible when the reset state already faces it, since
        # merely facing it would have ended the episode a step earlier)
        # also succeeds; a matching object dropped in front succeeds via
        # the refreshed grid. No failure status exists for GoTo missions.
        new_fwd = new_pos + dir_vec[new_dir]
        nfx = jnp.clip(new_fwd[0], 0, params.width - 1)
        nfy = jnp.clip(new_fwd[1], 0, params.height - 1)
        ncell = grid[nfx, nfy]
        matches_front = (ncell[0].astype(jnp.int32) == state.target[0]) & (
            ncell[1].astype(jnp.int32) == state.target[1])
        picked_match = does_pickup & (
            fobj.astype(jnp.int32) == state.target[0]) & (
            fcol.astype(jnp.int32) == state.target[1])
        succ = matches_front | picked_match
        terminated = terminated | succ
        reward = jnp.where(succ, time_reward, reward)
    elif params.success == "babyai_putnext":
        # BabyAI PutNextInstr (upstream verifier.py — reconstructed):
        # verified only on a drop ACTION (successful or not — upstream
        # checks the action, not the drop's effect); success iff some
        # grid object matching the move description is cardinally
        # adjacent to one matching the fixed description (pos_next_to,
        # d < 2). A still-carried move object sits at cur_pos (−1, −1)
        # upstream and cannot match — the grid-mask check reproduces
        # that for free. Objects never sit on the border, so the
        # jnp.roll wraparound is harmless.
        is_a = (grid[..., 0].astype(jnp.int32) == state.target[0]) & (
            grid[..., 1].astype(jnp.int32) == state.target[1])
        is_b = (grid[..., 0].astype(jnp.int32) == state.target[2]) & (
            grid[..., 1].astype(jnp.int32) == state.target[3])
        near_b = (jnp.roll(is_b, 1, 0) | jnp.roll(is_b, -1, 0)
                  | jnp.roll(is_b, 1, 1) | jnp.roll(is_b, -1, 1))
        succ = (action == A_DROP) & jnp.any(is_a & near_b)
        terminated = terminated | succ
        reward = jnp.where(succ, time_reward, reward)
    elif params.success == "babyai_pickup":
        # BabyAI PickupInstr (upstream verifier.py — reconstructed):
        # verified only on a pickup ACTION; success iff the agent is
        # then carrying an object matching the (possibly wildcarded:
        # −1) type/color. strict (PickupDistDebug) additionally FAILS
        # the episode when a pickup action leaves it carrying anything
        # non-matching.
        match = (carrying[0] != 0) & (
            (state.target[0] < 0)
            | (carrying[0].astype(jnp.int32) == state.target[0])) & (
            (state.target[1] < 0)
            | (carrying[1].astype(jnp.int32) == state.target[1]))
        succ = (action == A_PICKUP) & match
        terminated = terminated | succ
        reward = jnp.where(succ, time_reward, reward)
        if params.strict:
            fail = (action == A_PICKUP) & (carrying[0] != 0) & ~match
            terminated = terminated | fail
    elif params.success == "babyai_open_color":
        # BabyAI Open (upstream open.py + verifier.py OpenInstr on
        # ObjDesc("door", color) — reconstructed): verified on toggle
        # ACTIONS; success iff the front cell — post-toggle — is an OPEN
        # door of the mission color (any matching door in the maze
        # counts; the match set is color-wide, unlike the
        # position-packed OpenDoor variant). The agent never moves on a
        # toggle, so (fx, fy) is its front. target[1] < 0 wildcards the
        # color (UnlockLocal/KeyInBox: OpenInstr(ObjDesc("door"))).
        cell = grid[fx, fy]
        succ = ((action == A_TOGGLE) & (cell[0] == DOOR)
                & ((state.target[1] < 0)
                   | (cell[1].astype(jnp.int32) == state.target[1]))
                & (cell[2] == OPEN))
        terminated = terminated | succ
        reward = jnp.where(succ, time_reward, reward)
    elif params.success == "babyai_open":
        # BabyAI OpenInstr (upstream verifier.py — reconstructed):
        # verified only on toggle ACTIONS; success iff the front cell —
        # AFTER the toggle (RoomGridLevel.step verifies post-transition)
        # — is a door from the mission's match set (packed positions + 1
        # in target[:4]) and is now open. strict (OpenDoorDebug) FAILS
        # the episode whenever a toggle leaves a door in front without
        # success: a wrong door, or re-closing a matching open one.
        # The agent never moves on a toggle, so (fx, fy) is its front.
        cell = grid[fx, fy]
        packed = fx * params.height + fy + 1
        in_set = jnp.any(state.target[:4] == packed)
        succ = ((action == A_TOGGLE) & (cell[0] == DOOR)
                & (cell[2] == OPEN) & in_set)
        terminated = terminated | succ
        reward = jnp.where(succ, time_reward, reward)
        if params.strict:
            fail = (action == A_TOGGLE) & (cell[0] == DOOR) & ~succ
            terminated = terminated | fail
    elif params.success == "babyai_action":
        # BabyAI ActionObjDoor (upstream other.py + verifier.py —
        # reconstructed): the per-episode verb in target[0] picks the
        # verifier; all three match by (type, color) = target[1:3].
        # goto — GoToInstr: post-step front cell matches (plus the
        # pickup-from-a-facing-reset nuance, as in babyai_goto);
        # pickup — PickupInstr: a pickup action that leaves the agent
        # carrying a match; open — OpenInstr: a toggle that leaves a
        # matching door open in front.
        verb, ttype, tcol = state.target[0], state.target[1], state.target[2]
        new_fwd = new_pos + dir_vec[new_dir]
        nfx = jnp.clip(new_fwd[0], 0, params.width - 1)
        nfy = jnp.clip(new_fwd[1], 0, params.height - 1)
        ncell = grid[nfx, nfy]
        goto_succ = ((ncell[0].astype(jnp.int32) == ttype)
                     & (ncell[1].astype(jnp.int32) == tcol)) | (
            does_pickup & (fobj.astype(jnp.int32) == ttype)
            & (fcol.astype(jnp.int32) == tcol))
        pick_succ = ((action == A_PICKUP)
                     & (carrying[0].astype(jnp.int32) == ttype)
                     & (carrying[1].astype(jnp.int32) == tcol))
        cell = grid[fx, fy]
        open_succ = ((action == A_TOGGLE) & (cell[0] == DOOR)
                     & (cell[1].astype(jnp.int32) == tcol)
                     & (cell[2] == OPEN))
        succ = jnp.where(verb == 0, goto_succ,
                         jnp.where(verb == 1, pick_succ, open_succ))
        terminated = terminated | succ
        reward = jnp.where(succ, time_reward, reward)
    elif params.success == "putnear":
        # PutNear semantics (upstream putnear.py step — reconstructed):
        # a pickup that leaves the agent carrying anything but the move
        # object terminates with 0; a drop action while carrying always
        # terminates — rewarded iff the drop landed (fwd cell now holds
        # it) within Chebyshev distance 1 of the near-target's position.
        wrong_pickup = (action == A_PICKUP) & (carrying[0] != 0) & ~(
            (carrying[0].astype(jnp.int32) == state.target[0])
            & (carrying[1].astype(jnp.int32) == state.target[1]))
        drops = (action == A_DROP) & (state.carrying[0] != 0)
        landed_near = does_drop & (
            jnp.abs(fx - state.target[4]) <= 1) & (
            jnp.abs(fy - state.target[5]) <= 1)
        terminated = terminated | wrong_pickup | drops
        reward = jnp.where(drops & landed_near, time_reward, reward)

    instr, instr_state = state.instr, state.instr_state
    if params.success == "babyai_seq":
        # Composite instructions (upstream RoomGridLevel.step →
        # instrs.verify — see `_seq_verify`).
        seq_succ, seq_fail, instr, instr_state = _seq_verify(
            params, state, action, grid, new_pos, new_dir, fx, fy,
            fobj, fcol, does_pickup, does_drop, carrying,
        )
        terminated = terminated | seq_succ | seq_fail
        reward = jnp.where(seq_succ, time_reward, reward)

    if params.kind == "dynobs":
        # Post-transition penalty exactly like upstream: forward into a
        # pre-move-occupied non-goal cell → reward −1, episode over.
        collided = (action == A_FORWARD) & not_clear
        terminated = terminated | collided
        reward = jnp.where(collided, -1.0, reward)

    truncated = step_count >= params.max_steps

    new_state = EnvState(
        grid=grid,
        agent_pos=new_pos,
        agent_dir=new_dir,
        carrying=carrying,
        step_count=step_count,
        rng=state.rng,
        target=state.target,
        instr=instr,
        instr_state=instr_state,
    )
    return new_state, reward, terminated, truncated


# ---------------------------------------------------------------------------
# Observation (7×7×3 egocentric partial view)
# ---------------------------------------------------------------------------


def _process_vis(view: jax.Array) -> jax.Array:
    """MiniGrid's shadow-casting visibility over the rotated 7×7 view.

    Statically unrolled (the view is tiny); vmap vectorizes across envs.
    A cell lets light through unless it is a wall or a non-open door.
    """
    obj, st = view[..., 0], view[..., 2]
    opaque = (obj == WALL) | ((obj == DOOR) & (st != OPEN))
    mask = jnp.zeros((VIEW_SIZE, VIEW_SIZE), dtype=bool)
    mask = mask.at[_AGENT_VIEW_POS].set(True)
    for j in reversed(range(VIEW_SIZE)):
        for i in range(VIEW_SIZE - 1):
            vis = mask[i, j] & ~opaque[i, j]
            mask = mask.at[i + 1, j].set(mask[i + 1, j] | vis)
            if j > 0:
                mask = mask.at[i + 1, j - 1].set(mask[i + 1, j - 1] | vis)
                mask = mask.at[i, j - 1].set(mask[i, j - 1] | vis)
        for i in reversed(range(1, VIEW_SIZE)):
            vis = mask[i, j] & ~opaque[i, j]
            mask = mask.at[i - 1, j].set(mask[i - 1, j] | vis)
            if j > 0:
                mask = mask.at[i - 1, j - 1].set(mask[i - 1, j - 1] | vis)
                mask = mask.at[i, j - 1].set(mask[i, j - 1] | vis)
    return mask


@partial(jax.jit, static_argnames=("params",))
def observe(params: EnvParams, state: EnvState) -> jax.Array:
    """Egocentric ``[view, view, 3]`` uint8 observation, axis0 = view x.

    Equivalent to MiniGrid ``gen_obs()['image']`` consumed through
    ImgObsWrapper (`ppo_minigrid.py:110`).
    """
    f = jnp.asarray(DIR_TO_VEC)[state.agent_dir]          # forward
    r = jnp.asarray(DIR_TO_VEC)[(state.agent_dir + 1) % 4]  # right
    vx = jnp.arange(VIEW_SIZE).reshape(VIEW_SIZE, 1)
    vy = jnp.arange(VIEW_SIZE).reshape(1, VIEW_SIZE)
    steps_fwd = _AGENT_VIEW_POS[1] - vy  # 6 - vy
    steps_right = vx - _AGENT_VIEW_POS[0]  # vx - 3
    wx = state.agent_pos[0] + f[0] * steps_fwd + r[0] * steps_right
    wy = state.agent_pos[1] + f[1] * steps_fwd + r[1] * steps_right
    in_bounds = (wx >= 0) & (wx < params.width) & (wy >= 0) & (wy < params.height)
    cells = state.grid[jnp.clip(wx, 0, params.width - 1),
                       jnp.clip(wy, 0, params.height - 1)]
    wall_cell = jnp.asarray([WALL, GREY, 0], dtype=jnp.int8)
    view = jnp.where(in_bounds[..., None], cells, wall_cell)

    if not params.see_through_walls:
        vis = _process_vis(view)
        view = jnp.where(vis[..., None], view, jnp.zeros_like(view))

    # Agent cell shows the carried object (or empty if hands are free).
    carried = jnp.where(
        state.carrying[0] != 0,
        state.carrying,
        jnp.asarray([EMPTY, 0, 0], dtype=jnp.int8),
    )
    view = view.at[_AGENT_VIEW_POS[0], _AGENT_VIEW_POS[1]].set(carried)
    return view.astype(jnp.uint8)


# RGB palette matching MiniGrid's COLORS map (minigrid rendering).
_COLOR_RGB = np.array(
    [
        [255, 0, 0],     # red
        [0, 255, 0],     # green
        [0, 0, 255],     # blue
        [112, 39, 195],  # purple
        [255, 255, 0],   # yellow
        [100, 100, 100], # grey
    ],
    dtype=np.uint8,
)


@partial(jax.jit, static_argnames=("params", "tile_px"))
def render_rgb(params: EnvParams, state: EnvState, tile_px: int = 6) -> jax.Array:
    """Top-down RGB render of the full grid (`gym.make(render_mode=
    "rgb_array")` equivalent the reference records videos from,
    `ppo_minigrid.py:109,115`): colored tiles per object, grid lines, and
    a red directional agent marker. Pure JAX → can run in-graph so video
    capture costs one small D2H copy per iteration."""
    w, h = params.width, params.height
    W, H = w * tile_px, h * tile_px
    px = jnp.arange(W).reshape(1, W)   # image x (grid x)
    py = jnp.arange(H).reshape(H, 1)   # image y (grid y)
    cx = px // tile_px                 # grid cell x per pixel column
    cy = py // tile_px                 # grid cell y per pixel row
    ix = px % tile_px
    iy = py % tile_px

    # Per-pixel cell lookup: grid is [W, H, 3] with axis0 = x; index
    # broadcasting of [1,W] × [H,1] yields [H,W] image-layout arrays.
    obj = state.grid[..., 0][cx, cy]    # [H?, W?] — broadcasting of [1,W],[H,1] → [H,W]
    col = state.grid[..., 1][cx, cy]
    st = state.grid[..., 2][cx, cy]

    colors = jnp.asarray(_COLOR_RGB)
    base = colors[jnp.clip(col, 0, 5)]               # [H, W, 3]
    black = jnp.zeros(3, jnp.uint8)
    green = colors[GREEN]

    img = jnp.where((obj == WALL)[..., None], base, black)
    img = jnp.where((obj == GOAL)[..., None], green, img)
    img = jnp.where((obj == LAVA)[..., None], jnp.asarray([255, 128, 0], jnp.uint8), img)
    # Inset objects (key/ball/box): colored square with a 1px black margin.
    inset = (ix >= 1) & (ix < tile_px - 1) & (iy >= 1) & (iy < tile_px - 1)
    small = (obj == KEY) | (obj == BALL) | (obj == BOX)
    img = jnp.where((small & inset)[..., None], base, img)
    # Doors: open → frame only; closed/locked → filled.
    door = obj == DOOR
    frame_px = (ix == 0) | (ix == tile_px - 1) | (iy == 0) | (iy == tile_px - 1)
    img = jnp.where((door & (st != OPEN))[..., None], base, img)
    img = jnp.where((door & (st == OPEN) & frame_px)[..., None], base, img)

    # Agent: red triangle pointing along agent_dir.
    on_agent = (cx == state.agent_pos[0]) & (cy == state.agent_pos[1])
    t = tile_px
    tri_right = ix >= jnp.abs(2 * iy - (t - 1))
    tri_left = (t - 1 - ix) >= jnp.abs(2 * iy - (t - 1))
    tri_down = iy >= jnp.abs(2 * ix - (t - 1))
    tri_up = (t - 1 - iy) >= jnp.abs(2 * ix - (t - 1))
    tri = jnp.select(
        [state.agent_dir == 0, state.agent_dir == 1,
         state.agent_dir == 2, state.agent_dir == 3],
        [tri_right, tri_down, tri_left, tri_up],
    )
    img = jnp.where((on_agent & tri)[..., None], colors[RED], img)

    # Grid lines.
    line = (ix == 0) | (iy == 0)
    img = jnp.where((line & (obj == EMPTY))[..., None],
                    jnp.asarray([40, 40, 40], jnp.uint8), img)
    return img.astype(jnp.uint8)


def describe_rollout(
    grids: np.ndarray, agent_pos: np.ndarray, agent_dir: np.ndarray
) -> list[str]:
    """Descriptions for a whole rollout, flattened t-major to match the
    training batch layout ([T, N] → index t·N + n).

    ``grids`` is one [N, W, H, 3] snapshot (not per-step): the description's
    object list is the first 3 non-empty cells in x-major scan order, which
    on any bordered MiniGrid grid are the static border walls at
    (0,0),(0,1),(0,2) — so any snapshot of the same episode yields the
    identical list the reference computes per step
    (`clip_ppo_minigrid.py:164-211`). The grid scan therefore runs once
    per env (N), not once per sample (T·N) — this sits on the host
    critical path of every text-modality iteration.

    Known approximation: GoToDoor at sizes > 5 sometimes places its
    left-wall door at (0,2), so the suffix varies *across* episodes
    there; after a mid-rollout autoreset this snapshot's suffix is one
    episode stale (every other family's suffix is the static border
    wall — the fused text-table path guards this with a 16-reset
    constancy check and falls back to the split path).
    """
    t, n = agent_dir.shape
    obj_suffixes = [
        _objects_suffix(np.asarray(grids)[i]) for i in range(n)
    ]
    agent_pos = np.asarray(agent_pos).reshape(t * n, 2)
    agent_dir = np.asarray(agent_dir).reshape(t * n)
    out = []
    for i in range(t * n):
        desc = (
            f"agent at ({int(agent_pos[i][0])},{int(agent_pos[i][1])}) "
            f"facing {DIR_NAMES[int(agent_dir[i])]}"
        )
        out.append(desc + obj_suffixes[i % n])
    return out


def _objects_suffix(grid: np.ndarray, max_objects: int = 3) -> str:
    """", objects: ..." suffix from one grid's first non-empty cells."""
    objs = []
    w, h = grid.shape[:2]
    for x in range(w):
        for y in range(h):
            o = int(grid[x, y, 0])
            if o not in (UNSEEN, EMPTY):
                objs.append(f"{IDX_TO_OBJECT[o]} at ({x},{y})")
                if len(objs) >= max_objects:
                    return f", objects: {', '.join(objs)}"
    return f", objects: {', '.join(objs)}" if objs else ""


def describe_states(
    grids: np.ndarray, agent_pos: np.ndarray, agent_dir: np.ndarray, max_objects: int = 3
) -> list[str]:
    """Symbolic text descriptions from batched env state (host-side).

    Reproduces the reference's `_get_symbolic_descriptions`
    (`clip_ppo_minigrid.py:164-211`): agent position/direction plus the
    first ``max_objects`` non-empty cells in x-major scan order (which, on
    a bordered grid, are border walls — replicated faithfully).
    """
    out = []
    grids = np.asarray(grids)
    agent_pos = np.asarray(agent_pos)
    agent_dir = np.asarray(agent_dir)
    for b in range(grids.shape[0]):
        objs = []
        g = grids[b]
        w, h = g.shape[:2]
        for x in range(w):
            for y in range(h):
                o = int(g[x, y, 0])
                if o not in (UNSEEN, EMPTY):
                    objs.append(f"{IDX_TO_OBJECT[o]} at ({x},{y})")
                    if len(objs) >= max_objects:
                        break
            if len(objs) >= max_objects:
                break
        desc = (
            f"agent at ({int(agent_pos[b][0])},{int(agent_pos[b][1])}) "
            f"facing {DIR_NAMES[int(agent_dir[b])]}"
        )
        if objs:
            desc += f", objects: {', '.join(objs)}"
        out.append(desc)
    return out
