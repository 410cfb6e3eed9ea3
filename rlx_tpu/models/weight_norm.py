"""Weight-norm parameterization as a post-update param-tree projection.

Mirrors `rl_x/algorithms/xqc/flax/layers.py:38-61`: after every gradient
step, each hidden Dense layer's per-unit input weights (kernel column plus
bias) are renormalized to unit L2 norm, and optionally the predictor
(output head) kernels are column-normalized without touching the bias.
Keeping this as a pure pytree transform (rather than a reparameterized
module) keeps the forward pass a plain matmul — XLA fuses the projection
into the update step, so the hot path stays MXU-only.
"""

import flax.traverse_util
import jax.numpy as jnp


def _norm_dense(flat, path, norm_bias):
    kernel = flat[path + "/kernel"]
    bias = flat.get(path + "/bias")
    if norm_bias and bias is not None:
        weights = jnp.concatenate([kernel, jnp.expand_dims(bias, -2)], axis=-2)
    else:
        weights = kernel
    norm = jnp.linalg.norm(weights, axis=-2, keepdims=True)
    flat[path + "/kernel"] = kernel / norm
    if norm_bias and bias is not None:
        flat[path + "/bias"] = bias / jnp.squeeze(norm, -2)
    return flat


def weight_norm_params(params, predictor_names=("mean", "log_std", "value"),
                       normalize_last_layer=True):
    """Project all Dense kernels in ``params`` onto the unit sphere.

    Hidden layers (any Dense whose final path component is not in
    ``predictor_names``) are normalized together with their bias; predictor
    heads are kernel-only and only when ``normalize_last_layer``.
    """
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    layer_paths = sorted({
        "/".join(key.split("/")[:-1])
        for key in flat
        if key.endswith("/kernel")
    })
    for path in layer_paths:
        leaf_module = path.split("/")[-1]
        if leaf_module in predictor_names:
            if normalize_last_layer:
                flat = _norm_dense(flat, path, norm_bias=False)
        elif "Dense" in leaf_module:
            flat = _norm_dense(flat, path, norm_bias=True)
    return flax.traverse_util.unflatten_dict(flat, sep="/")
