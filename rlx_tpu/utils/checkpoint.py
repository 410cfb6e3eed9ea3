"""Single-file checkpoint artifacts (orbax + zip) with config snapshot.

Same UX as the reference (`rl_x/algorithms/ppo/flax_full_jit/ppo.py:382-425`):
a ``latest.model`` / ``best.model`` zip containing an orbax PyTree checkpoint
plus ``config_algorithm.json``; loading merges the stored algorithm config
except flags explicitly set on the CLI.

TPU additions: checkpoints are saved from fully-addressable host copies (so
sharded training state on a mesh can be saved from any topology and restored
onto a different one).
"""

import json
import os
import shutil

import jax
import orbax.checkpoint as ocp


def _to_host(tree):
    """Gather possibly-sharded arrays to fully-replicated host numpy."""
    return jax.tree.map(lambda x: jax.device_get(x), tree)


def full_state_dict(train_state_tree):
    """Arrays-only view of a pytree of TrainStates (drops apply_fn/tx), for
    preemption-safe checkpoints that include optimizer state and step count."""
    from flax import serialization

    return jax.tree.map(
        serialization.to_state_dict, train_state_tree,
        is_leaf=lambda x: hasattr(x, "opt_state"),
    )


def restore_full_state(train_state_tree, loaded):
    """Inverse of full_state_dict: pour arrays back into live TrainStates."""
    from flax import serialization

    return jax.tree.map(
        lambda state, data: serialization.from_state_dict(state, data)
        if hasattr(state, "opt_state") else data,
        train_state_tree, loaded,
        is_leaf=lambda x: hasattr(x, "opt_state"),
    )


def save_model_file(save_path, file_name, checkpoint_tree, algorithm_config_dict):
    """Write ``<save_path>/<file_name>`` (a zip) atomically."""
    os.makedirs(save_path, exist_ok=True)
    tmp_dir = os.path.join(save_path, "tmp")
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(os.path.abspath(os.path.join(tmp_dir, "checkpoint")), _to_host(checkpoint_tree))
    with open(os.path.join(tmp_dir, "config_algorithm.json"), "w") as f:
        json.dump(algorithm_config_dict, f)
    archive = shutil.make_archive(os.path.join(save_path, file_name), "zip", tmp_dir)
    os.replace(archive, os.path.join(save_path, file_name))
    shutil.rmtree(tmp_dir)


def load_model_file(model_path, target_tree=None):
    """Unpack a ``.model`` zip; returns (checkpoint_tree, algorithm_config_dict).

    When ``target_tree`` is given, the restore is structure/dtype-matched to it.
    """
    model_path = os.path.abspath(model_path)
    extract_dir = model_path + ".tmp"
    if os.path.exists(extract_dir):
        shutil.rmtree(extract_dir)
    shutil.unpack_archive(model_path, extract_dir, "zip")
    try:
        with open(os.path.join(extract_dir, "config_algorithm.json")) as f:
            algorithm_config = json.load(f)
        checkpointer = ocp.PyTreeCheckpointer()
        ckpt_dir = os.path.join(extract_dir, "checkpoint")
        if target_tree is not None:
            restored = checkpointer.restore(ckpt_dir, item=_to_host(target_tree))
        else:
            restored = checkpointer.restore(ckpt_dir)
    finally:
        shutil.rmtree(extract_dir)
    return restored, algorithm_config


def merge_loaded_algorithm_config(config, loaded_algorithm_config, explicitly_set_algorithm_params):
    """Reference semantics (`ppo/flax/ppo.py:440-450`): stored values win
    unless the flag was explicitly set on the command line."""
    for key, value in loaded_algorithm_config.items():
        if f"algorithm.{key}" not in explicitly_set_algorithm_params and key in config.algorithm:
            config.algorithm[key] = value
    return config
