"""Pallas TPU kernels: the native performance layer.

The reference is pure Python (SURVEY.md §2: zero native components); the
XLA-compiled JAX path in `core/` already plays the role of "native code".
This package goes one level deeper for the hot rollout loop: hand-written
Pallas kernels with the environment batch laid out along the TPU's 128-wide
vector lanes, keeping the entire multi-step simulation resident in VMEM.
"""

from minigrid_tpu.ops.fused_rollout import (  # noqa: F401
    build_fused_rollout,
    build_packed_xla_rollout,
    fused_rollout_supported,
)
from minigrid_tpu.ops.policy_rollout import (  # noqa: F401
    build_fused_train_rollout,
    build_policy_eval_rollout,
    policy_rollout_supported,
)
