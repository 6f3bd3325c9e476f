"""Data-model constants and semantic lookup tables.

The entire world model of the reference (gym_minigrid/minigrid.py:~10-80) is
three small integer vocabularies — object type, color, door state — plus the
four heading vectors. In the reference these feed a `WorldObj` class hierarchy
(minigrid.py:~80-365); here the class hierarchy is *data*: every virtual
predicate (`can_overlap`, `can_pickup`, `can_contain`, `see_behind`) becomes a
constant lookup table indexed by type id, so the step/vision kernels are
branchless gathers instead of polymorphic dispatch.

Index values are kept identical to the reference so that encoded observations
are byte-compatible.
"""

from __future__ import annotations

import numpy as np

# Size (in pixels) of a rendered tile cell (reference minigrid.py:~12).
TILE_PIXELS = 32

# Map of color names to RGB values (reference minigrid.py:~15-23).
COLORS = {
    "red": np.array([255, 0, 0], dtype=np.uint8),
    "green": np.array([0, 255, 0], dtype=np.uint8),
    "blue": np.array([0, 0, 255], dtype=np.uint8),
    "purple": np.array([112, 39, 195], dtype=np.uint8),
    "yellow": np.array([255, 255, 0], dtype=np.uint8),
    "grey": np.array([100, 100, 100], dtype=np.uint8),
}

# Sampling order matters: generators draw colors with `_rand_elem(COLOR_NAMES)`
# and COLOR_NAMES is the *sorted* key list (reference minigrid.py:~25).
COLOR_NAMES = sorted(COLORS.keys())  # blue, green, grey, purple, red, yellow

COLOR_TO_IDX = {
    "red": 0,
    "green": 1,
    "blue": 2,
    "purple": 3,
    "yellow": 4,
    "grey": 5,
}
IDX_TO_COLOR = {v: k for k, v in COLOR_TO_IDX.items()}

# (num_colors, 3) uint8 palette indexed by color id — used by the renderer.
COLOR_PALETTE = np.stack([COLORS[IDX_TO_COLOR[i]] for i in range(len(COLOR_TO_IDX))])

OBJECT_TO_IDX = {
    "unseen": 0,
    "empty": 1,
    "wall": 2,
    "floor": 3,
    "door": 4,
    "key": 5,
    "ball": 6,
    "box": 7,
    "goal": 8,
    "lava": 9,
    "agent": 10,
}
IDX_TO_OBJECT = {v: k for k, v in OBJECT_TO_IDX.items()}
NUM_OBJECTS = len(OBJECT_TO_IDX)  # 11

# Door-state channel vocabulary (reference minigrid.py:~60-64).
STATE_TO_IDX = {"open": 0, "closed": 1, "locked": 2}
IDX_TO_STATE = {v: k for k, v in STATE_TO_IDX.items()}
NUM_STATES = len(STATE_TO_IDX)  # 3
NUM_COLORS = len(COLOR_TO_IDX)  # 6

# Short aliases used throughout the kernels.
UNSEEN = OBJECT_TO_IDX["unseen"]  # 0
EMPTY = OBJECT_TO_IDX["empty"]  # 1
WALL = OBJECT_TO_IDX["wall"]  # 2
FLOOR = OBJECT_TO_IDX["floor"]  # 3
DOOR = OBJECT_TO_IDX["door"]  # 4
KEY = OBJECT_TO_IDX["key"]  # 5
BALL = OBJECT_TO_IDX["ball"]  # 6
BOX = OBJECT_TO_IDX["box"]  # 7
GOAL = OBJECT_TO_IDX["goal"]  # 8
LAVA = OBJECT_TO_IDX["lava"]  # 9
AGENT = OBJECT_TO_IDX["agent"]  # 10

STATE_OPEN = STATE_TO_IDX["open"]  # 0
STATE_CLOSED = STATE_TO_IDX["closed"]  # 1
STATE_LOCKED = STATE_TO_IDX["locked"]  # 2

RED = COLOR_TO_IDX["red"]
GREEN = COLOR_TO_IDX["green"]
BLUE = COLOR_TO_IDX["blue"]
PURPLE = COLOR_TO_IDX["purple"]
YELLOW = COLOR_TO_IDX["yellow"]
GREY = COLOR_TO_IDX["grey"]

# Heading id -> (dx, dy): 0=right(+x), 1=down(+y), 2=left, 3=up
# (reference minigrid.py:~66-77). Turn-right is (d+1)%4.
DIR_TO_VEC = np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.int32)

# ---------------------------------------------------------------------------
# Semantic predicate tables — the WorldObj virtual methods as data.
#
# Door is the one type whose predicates depend on the state channel; its table
# entry here is the *state-independent* part and the kernels combine it with
# the state channel explicitly:
#   door_can_overlap = (state == STATE_OPEN)
#   door_see_behind  = (state == STATE_OPEN)
# Reference semantics: minigrid.py:~162-365 (Goal/Floor/Lava/Wall/Door/Key/
# Ball/Box class bodies).
# ---------------------------------------------------------------------------

_t = np.zeros(NUM_OBJECTS, dtype=bool)

# can_overlap(): Goal, Floor, Lava (and open Door — state-dependent).
# 'empty' (no object) is overlappable by definition of the step rule.
CAN_OVERLAP = _t.copy()
CAN_OVERLAP[[EMPTY, FLOOR, GOAL, LAVA]] = True

# can_pickup(): Key, Ball, Box.
CAN_PICKUP = _t.copy()
CAN_PICKUP[[KEY, BALL, BOX]] = True

# can_contain(): Box only.
CAN_CONTAIN = _t.copy()
CAN_CONTAIN[BOX] = True

# see_behind(): everything except Wall (and non-open Door — state-dependent).
SEE_BEHIND = np.ones(NUM_OBJECTS, dtype=bool)
SEE_BEHIND[WALL] = False

# Types whose encoded state channel is the door-state machine; all other
# types encode state 0 (reference WorldObj.encode minigrid.py:~120-158).
HAS_DOOR_STATE = _t.copy()
HAS_DOOR_STATE[DOOR] = True

# Stepping onto these (via `forward`) terminates the episode:
# goal -> reward = 1 - 0.9*t/T, lava -> reward 0 (reference step minigrid.py:~1087).
TERMINATES_GOAL = GOAL
TERMINATES_LAVA = LAVA
