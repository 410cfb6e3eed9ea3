"""Convert a trained rlx_tpu ppo_gru ``.model`` checkpoint into PyTorch
weights + meta JSON for the RCSSServerMJ nn_client.

Deployment glue mirroring the reference's
`robocup_soccer/rcssserver_deployment/convert.py:1-288` for the rlx_tpu
checkpoint format and policy architecture: the flax param tree
(`rlx_tpu/models/recurrent.py::RecurrentPolicy`, cell_type="gru") is mapped
onto ``torch_policy.TorchPolicyGRU``, and the meta JSON records everything
the server-side client needs to reproduce the env's action pipeline
(policy observation indices, PD scaling factor, nominal joint positions).

    python convert.py --model latest.model --env locomotion.soccer.tpu \
        --output locomotion_nn.pth --meta-output locomotion_nn_meta.json
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), *[".."] * 4))

import numpy as np


def to_torch(x):
    import torch

    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def copy_linear(sd, prefix, block):
    sd[f"{prefix}.weight"] = to_torch(block["kernel"]).T.contiguous()
    if "bias" in block:
        sd[f"{prefix}.bias"] = to_torch(block["bias"])


def copy_layernorm(sd, prefix, block):
    sd[f"{prefix}.weight"] = to_torch(block["scale"])
    sd[f"{prefix}.bias"] = to_torch(block["bias"])


def copy_gru(sd, prefix, cell, hidden_dim):
    """flax nn.GRUCell {ir,iz,in,hr,hz,hn} -> torch nn.GRUCell r|z|n stacks.

    Both compute n = tanh(W_in x + b_in + r * (W_hn h + b_hn)); flax keeps
    no bias on hr/hz, which maps to zero slices of torch's bias_hh.
    """
    import torch

    w_ih = torch.cat([to_torch(cell[k]["kernel"]).T for k in ("ir", "iz", "in")], dim=0)
    w_hh = torch.cat([to_torch(cell[k]["kernel"]).T for k in ("hr", "hz", "hn")], dim=0)
    b_ih = torch.cat([to_torch(cell[k]["bias"]) for k in ("ir", "iz", "in")], dim=0)
    zeros = torch.zeros(hidden_dim)
    hn_bias = to_torch(cell["hn"]["bias"]) if "bias" in cell["hn"] else zeros
    b_hh = torch.cat([zeros, zeros, hn_bias], dim=0)
    sd[f"{prefix}.weight_ih"] = w_ih
    sd[f"{prefix}.weight_hh"] = w_hh
    sd[f"{prefix}.bias_ih"] = b_ih
    sd[f"{prefix}.bias_hh"] = b_hh


def convert_policy_params(params):
    """flax RecurrentPolicy params -> (torch state_dict, arch dict)."""
    p = params["params"] if "params" in params else params
    share_encoder = "obs_encoder" not in p
    combine_method = "film" if "film_gamma" in p else "concat"
    obs_dim = int(np.asarray(p["cell_obs_encoder"]["kernel"]).shape[0])
    obs_encoding_dim = int(np.asarray(p["cell_obs_encoder"]["kernel"]).shape[1])
    hidden_dim = int(np.asarray(p["cell"]["ir"]["kernel"]).shape[1])
    action_dim = int(np.asarray(p["mean_head"]["kernel"]).shape[1])

    sd = {}
    copy_linear(sd, "cell_obs_encoder", p["cell_obs_encoder"])
    copy_layernorm(sd, "cell_obs_ln", p["cell_obs_ln"])
    if not share_encoder:
        copy_linear(sd, "obs_encoder", p["obs_encoder"])
        copy_layernorm(sd, "obs_ln", p["obs_ln"])
    copy_gru(sd, "cell", p["cell"], hidden_dim)
    copy_layernorm(sd, "cell_ln", p["cell_ln"])
    if combine_method == "film":
        copy_linear(sd, "film_gamma", p["film_gamma"])
        copy_linear(sd, "film_beta", p["film_beta"])
    copy_linear(sd, "torso_dense1", p["torso_dense1"])
    copy_layernorm(sd, "torso_ln1", p["torso_ln1"])
    copy_linear(sd, "torso_dense2", p["torso_dense2"])
    copy_linear(sd, "torso_dense3", p["torso_dense3"])
    copy_linear(sd, "mean_head", p["mean_head"])

    arch = {
        "obs_dim": obs_dim,
        "action_dim": action_dim,
        "obs_encoding_dim": obs_encoding_dim,
        "hidden_dim": hidden_dim,
        "combine_method": combine_method,
        "share_encoder": share_encoder,
    }
    return sd, arch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help=".model checkpoint (ppo_gru)")
    parser.add_argument("--env", default="locomotion.soccer.tpu")
    parser.add_argument("--output", default="locomotion_nn.pth")
    parser.add_argument("--meta-output", default="locomotion_nn_meta.json")
    args = parser.parse_args()

    import torch

    from rlx_tpu.config import make_config
    from rlx_tpu.environments.environment_manager import get_environment_create_env
    from rlx_tpu.utils import checkpoint as ckpt

    restored, algo_config = ckpt.load_model_file(args.model)
    sd, arch = convert_policy_params(restored["policy"])

    config = make_config("ppo_gru.tpu", args.env, **{"environment.nr_envs": 1})
    env, _ = get_environment_create_env(args.env)(config)

    from torch_policy import TorchPolicyGRU

    policy = TorchPolicyGRU(**arch)
    policy.load_state_dict({k: v for k, v in sd.items()})
    torch.save(policy.state_dict(), args.output)

    meta = {
        **arch,
        "policy_observation_indices": np.asarray(env.policy_observation_indices).tolist(),
        "action_scaling_factor": float(env.robot_config["scaling_factor"]),
        "nominal_joint_positions": np.asarray(env.nominal_joint_positions).tolist(),
        "control_frequency_hz": env.control_frequency_hz,
        "algorithm_config": algo_config,
    }
    with open(args.meta_output, "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {args.output} and {args.meta_output}")


if __name__ == "__main__":
    main()
