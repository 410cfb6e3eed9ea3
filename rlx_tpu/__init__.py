"""rlx_tpu — a TPU-native deep reinforcement learning framework.

Re-imagines the capabilities of RL-X (reference: /root/reference) as a
JAX/XLA/pjit/Pallas-first framework:

- Every algorithm is a single fused jitted training program (the reference's
  ``flax_full_jit`` style, `rl_x/algorithms/ppo/flax_full_jit/ppo.py:115-348`,
  promoted to THE primary path).
- Environments are batched pure-JAX functions stepped *inside* the program;
  host environments (Gymnasium) are bridged via io_callback shards.
- Parallelism is expressed over a `jax.sharding.Mesh` ("dp", "tp") with XLA
  collectives over ICI — not host-driven loops.

Layout:
- ``rlx_tpu.runner``        CLI / config / experiment orchestration
- ``rlx_tpu.algorithms``    one directory per algorithm, self-registering
- ``rlx_tpu.environments``  one directory per environment, self-registering
- ``rlx_tpu.models``        shared network building blocks (Flax linen)
- ``rlx_tpu.ops``           GAE, replay buffers, normalizers, distributional ops
- ``rlx_tpu.parallel``      mesh construction, sharding rules, distributed init
- ``rlx_tpu.utils``         logging, checkpointing, timing
"""

__version__ = "0.1.0"
