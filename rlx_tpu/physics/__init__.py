"""Pure-JAX batched rigid-body physics (the TPU-native MJX replacement).

The reference relies on external GPU physics (MJX / mujoco-warp,
`rl_x/environments/custom_mujoco/ant/mjx/environment.py:24-25`); neither is
TPU-available, so this package provides a from-scratch engine:

- MJCF models are compiled ON HOST ONCE via the MuJoCo C bindings into a
  static ``PhysicsModel`` of numpy constants (`rlx_tpu/physics/model.py`);
- stepping is pure JAX over ``[B, ...]`` batches: forward kinematics,
  world-frame Jacobians, dense mass matrix (M = sum_i J_i^T I_i J_i),
  bias forces via the velocity-product recursion, penalty contacts,
  PD/motor actuators, semi-implicit Euler with quaternion integration
  (`rlx_tpu/physics/engine.py`);
- supported MJCF subset: free + hinge joints, sphere/capsule collision
  geoms against the ground plane (explicit <contact><pair> honored),
  position/motor actuators, joint damping/armature/frictionloss/limits.

Batched over thousands of envs the per-step work is [B, nv, nv] solves and
[B, 6, nv] einsums — dense, static-shaped, MXU/VPU-friendly.

Validation: smooth-dynamics golden tests against MuJoCo C (mass matrix,
bias forces, qacc) in tests/test_physics.py; contact model is soft
(spring-damper + smooth friction, brax-style) by design.
"""

from rlx_tpu.physics.model import PhysicsModel, load_mjcf  # noqa: F401
from rlx_tpu.physics.engine import (  # noqa: F401
    DomainParams,
    Terrain,
    forward_dynamics,
    step,
    terrain_height_T,
)
