"""Runner config namespace, mirroring `rl_x/runner/default_config.py:5-29`
plus the TPU build's mesh controls."""

from ml_collections import config_dict


def get_config():
    config = config_dict.ConfigDict()

    config.mode = "train"

    config.track_console = False
    config.track_tb = False
    config.track_wandb = False
    config.wandb_entity = ""
    config.project_name = "rlx_tpu"
    config.exp_name = "default"
    config.run_name = ""
    config.notes = ""

    config.save_model = False
    config.load_model = ""
    # Preemption-safe checkpoints: include optimizer state + step counters so
    # interrupted runs restore exactly (reference saves params only).
    config.save_optimizer_state = False
    config.nr_test_episodes = 10
    config.render_video = ""  # test mode: offscreen rollout video (.mp4 or PNG dir)
    config.render_interactive = False  # test mode: GLFW window (needs GL + display)

    # Write a TensorBoard-viewable device trace of the whole run
    # (jax.profiler.trace) into this directory when set.
    config.profile_dir = ""

    # JAX / XLA setup
    config.jax_default_matmul_precision = "bfloat16"
    config.jax_compilation_cache_dir = "/tmp/rlx_tpu_jax_cache"
    config.device = ""  # "", "cpu", "tpu" — "" keeps the default backend

    # Chunked training: run each evaluation/save iteration as its own device
    # call (host loop) instead of one fused scan over the full budget.  Same
    # semantics; needed on tunneled TPUs where a single multi-minute XLA
    # execution gets dropped by the transport, and useful for very long runs
    # generally (keeps per-call execution bounded).  Supported by every
    # algorithm family via rlx_tpu/algorithms/training_program.py; parity
    # with the fused scan is pinned by tests/test_chunked_train.py.
    config.chunked_train = False

    # Pallas kernel paths for the hot ops (GAE, categorical projection):
    # "off" = fused-XLA defaults; "on" = Mosaic kernels (direct-attached
    # TPUs only — Mosaic hangs over the hosted axon tunnel); "interpret" =
    # same kernels through the Pallas interpreter (validation).
    config.pallas_kernels = "off"

    # Device mesh ("dp", "tp"); dp = -1 means all remaining devices.
    config.mesh_dp = -1
    config.mesh_tp = 1

    # Multi-host (TPU pods): set coordinator_address to enable
    # jax.distributed.initialize before any computation.
    config.coordinator_address = ""
    config.num_processes = 1
    config.process_id = 0

    return config
