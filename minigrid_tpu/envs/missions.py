"""Mission strings as device-resident integer tuples.

The reference stores `self.mission` as a Python string assembled inside
`_gen_grid` (e.g. fetch.py:~40-55 picks one of five synonym templates).
Strings cannot live in device arrays, so missions are encoded as
`(template_id, slot0..slot6)` int32 vectors in `EnvState.mission` and
detokenized on host at the API boundary.

Slots hold small integers whose meaning is template-defined — color ids,
object-type ids, or raw scalars. `detokenize` reproduces the reference's
exact mission text for every registered template.
"""

from __future__ import annotations

from typing import List

import numpy as np

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import MISSION_LEN

# Slot-substitution markers usable inside a template string.
# {c0} {c1} ... color-name slots; {t0} {t1} ... object-type slots;
# {d0} ... raw integer slots.
_TEMPLATES: List[str] = [
    "",  # template 0: empty mission (Playground)
]


def register_template(fmt: str) -> int:
    """Register a mission template; returns its id. Idempotent on identical
    format strings so modules can re-import safely."""
    if fmt in _TEMPLATES:
        return _TEMPLATES.index(fmt)
    _TEMPLATES.append(fmt)
    return len(_TEMPLATES) - 1


def encode(template_id: int, *slots: int) -> np.ndarray:
    """Build a `(MISSION_LEN,)` int32 mission vector (host-side, static)."""
    vec = np.zeros(MISSION_LEN, dtype=np.int32)
    vec[0] = template_id
    for i, s in enumerate(slots):
        vec[1 + i] = s
    return vec


def detokenize(mission: np.ndarray) -> str:
    """Recover the reference mission string from a mission id vector."""
    mission = np.asarray(mission)
    fmt = _TEMPLATES[int(mission[0])]
    out = fmt
    for i in range(MISSION_LEN - 1):
        val = int(mission[1 + i])
        out = out.replace("{c%d}" % i, C.IDX_TO_COLOR.get(val, "?"))
        out = out.replace("{t%d}" % i, C.IDX_TO_OBJECT.get(val, "?"))
        out = out.replace("{d%d}" % i, str(val))
    return out
