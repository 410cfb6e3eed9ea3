"""Regex-rule based parameter partitioning for tensor parallelism.

The reference has no model-parallel path (SURVEY.md §2.5); this module
provides it for the TPU build: map each parameter path to a PartitionSpec by
rule list, with a default Megatron-style alternating column/row scheme for
MLP stacks (first Dense kernel column-sharded over ``tp``, next row-sharded,
so activations stay sharded over tp between them and XLA inserts a single
psum at the row-parallel layer's output).
"""

import re

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rlx_tpu.parallel.mesh import TP_AXIS


def _param_paths(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in flat]


def match_partition_rules(rules, params, default=P()):
    """Return a pytree of PartitionSpec matching ``rules`` (list of
    (regex, PartitionSpec)) against '/'-joined parameter paths."""

    def spec_for(path, leaf):
        if np.ndim(leaf) == 0 or np.prod(np.shape(leaf)) == 1:
            return P()
        for rule, spec in rules:
            if re.search(rule, path):
                return spec
        return default

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [spec_for(jax.tree_util.keystr(path), leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def alternating_mlp_rules(params):
    """Build per-leaf PartitionSpecs sharding Dense kernels alternately
    column-wise / row-wise over tp, replicating everything else.

    Works on any linen param tree where Dense layers appear as
    ``.../Dense_k/kernel`` with 2D kernels ``(in, out)``.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    dense_idx = 0
    for path, leaf in flat:
        path_str = jax.tree_util.keystr(path)
        if path_str.endswith("['kernel']") and np.ndim(leaf) == 2:
            if dense_idx % 2 == 0:
                specs.append(P(None, TP_AXIS))  # column parallel
            else:
                specs.append(P(TP_AXIS, None))  # row parallel
            dense_idx += 1
        else:
            specs.append(P())
    return jax.tree_util.tree_unflatten(treedef, specs)


def tp_specs_for_tree(tree, tp_size=2):
    """PartitionSpecs for an arbitrary pytree (params, TrainState, opt state):
    every 2D ``.../Dense_<k>/kernel`` leaf is sharded over tp (column-parallel
    for even k, row-parallel for odd k — adam moments share the param paths so
    they shard identically); everything else is replicated.

    The parity heuristic may occasionally pick two same-orientation layers in
    a row; XLA then inserts the required collective — semantics are always
    correct, orientation only affects collective placement.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    specs = []
    dense_re = re.compile(r"Dense_(\d+)'?\]\['kernel'\]$")
    for path, leaf in flat:
        path_str = jax.tree_util.keystr(path)
        m = dense_re.search(path_str)
        if m and np.ndim(leaf) == 2:
            col = P(None, TP_AXIS) if np.shape(leaf)[1] % tp_size == 0 else None
            row = P(TP_AXIS, None) if np.shape(leaf)[0] % tp_size == 0 else None
            preferred = col if int(m.group(1)) % 2 == 0 else row
            specs.append(preferred or col or row or P())
        else:
            specs.append(P())
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_tree(tree, mesh, specs):
    """device_put a pytree according to per-leaf PartitionSpecs."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def constrain_params(params, mesh, specs):
    return jax.tree.map(
        lambda x, s: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, s)),
        params,
        specs,
    )
