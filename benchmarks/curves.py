"""Learning-curve parity harness (BASELINE.md configs + family spot checks).

Runs a named config to a fixed step budget, records the in-program eval
history (return vs env steps; callback-free, so it also works on the hosted
TPU where host callbacks are unavailable), asserts the final return against
a threshold band, and writes `benchmarks/results/<name>[_rN].json`.

For BASELINE head-to-head configs, `--with-reference` additionally runs the
REFERENCE's own flax implementation (`rl_x/algorithms/{ppo,sac}/flax`) in a
subprocess on the same Gymnasium task with the same budget and records its
eval curve next to ours — the reference env id is config-driven
(`rl_x/environments/gym/mujoco/humanoid_v4/default_config.py:9`,
`config.type`), so Hopper-v5 / HalfCheetah-v5 run through the reference's
humanoid_v4 registration unchanged.  `benchmarks/_refshim/` holds the
compat layer: a no-op wandb stub plus a launcher patching gymnasium 1.x
API drift (autoreset modes, wrapper forwarding, final_info format).

Practical note: the reference's host-loop style (one jitted call PER env
step) needs a real CPU to keep up — on this round's 2-core dev box it runs
~5 env-steps/s, so the recorded hopper/halfcheetah curves are ours-only
with literature thresholds; rerun `--with-reference` on a normal host for
the overlayed reference curve.

    python benchmarks/curves.py hopper_ppo --with-reference
    python benchmarks/curves.py pendulum_spot_td3
    python benchmarks/curves.py locomotion_lstm --device tpu
    python benchmarks/curves.py --list
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS_DIR = os.path.join(REPO, "benchmarks", "results")
REFERENCE = "/root/reference"

# Reference-matched hyperparameters (`rl_x/algorithms/ppo/flax/default_config.py`)
_REF_PPO = {
    "algorithm.learning_rate": 3e-4,
    "algorithm.anneal_learning_rate": False,
    "algorithm.nr_steps": 2048 // 8,  # 8 envs x 256 steps = same 2048-sample batch
    "algorithm.nr_epochs": 10,
    "algorithm.minibatch_size": 64,
    "algorithm.gamma": 0.99,
    "algorithm.gae_lambda": 0.95,
    "algorithm.clip_range": 0.2,
    "algorithm.entropy_coef": 0.0,
    "algorithm.critic_coef": 0.5,
    "algorithm.max_grad_norm": 0.5,
    "algorithm.action_clipping_and_rescaling": True,
    "algorithm.policy_hidden_sizes": (256, 256),
    "algorithm.critic_hidden_sizes": (256, 256),
}

RUNS = {
    # ---- BASELINE.md benchmark configs --------------------------------
    "pendulum_ppo": {  # BASELINE config 1 (tuned gamma unlock, tests/test_ppo.py:69)
        "algorithm": "ppo.tpu", "environment": "classic.pendulum.tpu",
        "budget": 200_000, "threshold": -700.0, "eval_points": 10,
        "overrides": {
            "algorithm.nr_steps": 256, "algorithm.minibatch_size": 512,
            "algorithm.nr_epochs": 10, "algorithm.learning_rate": 1e-3,
            "algorithm.gamma": 0.9, "environment.nr_envs": 8,
        },
        "reference": {
            # head-to-head vs the reference's own flax PPO on the same task
            # (`rl_x/algorithms/ppo/flax/ppo.py`); Pendulum-v1 runs through
            # the type-driven gym registration, nr_envs=1 = reference default
            "algorithm": "ppo.flax", "environment": "gym.mujoco.humanoid_v4",
            "type": "Pendulum-v1", "nr_envs": 1,
        },
    },
    "hopper_ppo": {  # BASELINE config 2, head-to-head vs reference ppo.flax
        "algorithm": "ppo.tpu", "environment": "gym.mujoco.hopper_v5.host",
        "budget": 300_000, "threshold": 800.0, "eval_points": 12,
        "overrides": {**_REF_PPO, "environment.nr_envs": 8},
        "reference": {
            # 8 envs x 256 steps = the SAME 2048-sample batch as both the
            # reference's nr_envs=1 default and our recipe above — identical
            # update cadence, ~8x fewer host-loop dispatches (the r4 overlay
            # at nr_envs=1 managed 49k steps in 2.4h; see overlay_bg.py).
            # Async wrapper is Sync-substituted at skip=0 (see
            # _refshim/run_reference.py).
            "algorithm": "ppo.flax", "environment": "gym.mujoco.humanoid_v4",
            "type": "Hopper-v5", "nr_envs": 8,
            "algorithm_overrides": {"algorithm.nr_steps": 256},
        },
    },
    # BASELINE config 4 stand-in while ale_py is absent from the image: the
    # reference's DQN track is images+discrete ONLY (NatureCNN,
    # `rl_x/algorithms/dqn/flax/critic.py:20-33`); pixel_chase needs real
    # 4-frame motion perception (equal-speed wrapping goal — pure pursuit
    # provably cannot close; see the env docstring + stack1 negative control)
    "pixel_chase_dqn": {
        "algorithm": "dqn.tpu", "environment": "classic.pixel_chase.tpu",
        "budget": 400_000, "threshold": 0.6, "eval_points": 8,
        "overrides": {
            "environment.nr_envs": 128,
            "algorithm.learning_starts": 10_000,
            "algorithm.buffer_size": 30_000,
            "algorithm.batch_size": 256,
            "algorithm.learning_rate": 1e-4,
            "algorithm.epsilon_decay_steps": 150_000,
            "algorithm.target_update_frequency": 4_000,
            "algorithm.update_frequency": 1,
        },
    },
    "pixel_chase_dqn_stack1": {  # NEGATIVE control: one frame -> no interception
        "algorithm": "dqn.tpu", "environment": "classic.pixel_chase.tpu",
        "budget": 400_000, "threshold": 0.6, "eval_points": 8,
        "expect": "below",
        "overrides": {
            "environment.nr_envs": 128,
            "environment.frame_stack": 1,
            "algorithm.learning_starts": 10_000,
            "algorithm.buffer_size": 30_000,
            "algorithm.batch_size": 256,
            "algorithm.learning_rate": 1e-4,
            "algorithm.epsilon_decay_steps": 150_000,
            "algorithm.target_update_frequency": 4_000,
            "algorithm.update_frequency": 1,
        },
    },
    "walker2d_ppo": {  # second on-policy head-to-head (VERDICT r4 next #6)
        # threshold 500: above the ~280 random-policy floor and below every
        # observed full-budget final, INCLUDING the reference's own ~558
        # (walker2d PPO is slow to take off at 300k; the overlay comparison
        # is the content here)
        "algorithm": "ppo.tpu", "environment": "gym.mujoco.walker2d_v5.host",
        "budget": 300_000, "threshold": 500.0, "eval_points": 12,
        "overrides": {**_REF_PPO, "environment.nr_envs": 8},
        "reference": {
            # same 2048-sample-batch recipe rationale as hopper_ppo above
            "algorithm": "ppo.flax", "environment": "gym.mujoco.humanoid_v4",
            "type": "Walker2d-v5", "nr_envs": 8,
            "algorithm_overrides": {"algorithm.nr_steps": 256},
        },
    },
    # The rebuilt exact-layer-zoo FlashSAC (round 5) on a real MuJoCo task:
    # its fast-learning recipe (BatchNorm unit-norm nets, categorical twin
    # critics, reward normalizer, colored noise) reaches vanilla-SAC's 100k
    # HalfCheetah score in well under half the steps (probe: 2112 at 20k).
    # CPU host-loop is ~10 env-steps/s with the BN nets, hence the modest
    # budget; defaults otherwise (lr band 3e-4 -> 1.5e-4 over the budget).
    "halfcheetah_flashsac": {
        "algorithm": "flashsac.tpu", "environment": "gym.mujoco.half_cheetah_v5.host",
        "budget": 40_000, "threshold": 2000.0, "eval_points": 8,
        "overrides": {"environment.nr_envs": 1},
    },
    "halfcheetah_sac": {  # BASELINE config 3, head-to-head vs reference sac.flax
        "algorithm": "sac.tpu", "environment": "gym.mujoco.half_cheetah_v5.host",
        "budget": 100_000, "threshold": 2000.0, "eval_points": 8,
        "overrides": {"environment.nr_envs": 1},  # reference default: 1 env, 1 update/step
        "reference": {
            "algorithm": "sac.flax", "environment": "gym.mujoco.humanoid_v4",
            "type": "HalfCheetah-v5", "nr_envs": 1,
        },
    },
    # dm_control learning evidence through the native C++ batcher (VERDICT
    # r4 next #4; the track was golden-transition-tested only).  Reference
    # counterpart: the envpool dmc registration
    # (`rl_x/environments/envpool/dmc/humanoid_run_v1/create_env.py`) —
    # same SAC-on-a-dmc-task shape, modest budget.  walker_walk rewards are
    # dm_control-normalized [0, 1]/step over 1000-step episodes (max 1000);
    # random policy scores ~25, SAC passes 300 comfortably by 150k.
    "dmc_walker_walk_sac": {
        "algorithm": "sac.tpu", "environment": "native.dmc_walker_walk.host",
        "budget": 150_000, "threshold": 300.0, "eval_points": 8,
        "overrides": {"environment.nr_envs": 1},  # 1 update per env step
    },
    # Metric: eval/episode_tracking = 1 - mean normalized |v - v_cmd| over
    # the episode (the curriculum's own success measure) — "tracking reward"
    # in the same normalized sense round-1's ant benchmark used.  Note the
    # reference trains this env family for 2e9 steps with nr_steps=128
    # (`ppo_lstm/flax_full_jit/default_config.py:11-16`); at this 50M budget
    # the higher-update-frequency recipe below learns much faster (measured:
    # ns=128/10-epoch recipe reaches 0.28 return vs 0.51 for ns=32/4).
    # Plain PPO needs its natural budget: at 50M the three-seed spread is
    # 0.45-0.49 (the round-3 single-seed 0.53 was a lucky draw); the curve is
    # monotone through 150M (0.62, locomotion_ppo_150m.json) and the
    # reference trains this family for 2e9 steps.
    "locomotion_ppo": {  # bisect control for config 5: plain PPO, feedforward
        "algorithm": "ppo.tpu", "environment": "locomotion.robot.tpu",
        "budget": 150_000_000, "threshold": 0.5, "eval_points": 10,
        "metric": "eval/episode_tracking",
        "overrides": {
            "environment.nr_envs": 4096,
            "algorithm.nr_steps": 32,
            "algorithm.minibatch_size": 32768,  # = 4096*32 / 4 minibatches
            "algorithm.nr_epochs": 4,
            "algorithm.learning_rate": 3e-4,
            "algorithm.logging_active": False,
        },
    },
    "locomotion_lstm": {  # BASELINE config 5: PPO+LSTM, 4096 envs, device env
        "algorithm": "ppo_lstm.tpu", "environment": "locomotion.robot.tpu",
        "budget": 50_000_000, "threshold": 0.5, "eval_points": 10,
        "metric": "eval/episode_tracking",
        "overrides": {
            "environment.nr_envs": 4096,
            "algorithm.nr_steps": 32,
            "algorithm.nr_minibatches": 4,
            "algorithm.nr_epochs": 4,
            "algorithm.learning_rate": 3e-4,
            "algorithm.rnn_hidden_dim": 128,
            "algorithm.logging_active": False,  # host callbacks unavailable on TPU tunnel
        },
    },
    "locomotion_ppo_150m": {  # long-horizon stability probe (VERDICT r3 weak #4)
        "algorithm": "ppo.tpu", "environment": "locomotion.robot.tpu",
        "budget": 150_000_000, "threshold": 0.5, "eval_points": 10,
        "metric": "eval/episode_tracking",
        "overrides": {
            "environment.nr_envs": 4096,
            "algorithm.nr_steps": 32,
            "algorithm.minibatch_size": 32768,
            "algorithm.nr_epochs": 4,
            "algorithm.learning_rate": 3e-4,
            "algorithm.logging_active": False,
        },
    },
    "locomotion_ppo_bf16": {  # bench-dtype validation: bf16 trunks must learn
        "algorithm": "ppo.tpu", "environment": "locomotion.robot.tpu",
        "budget": 50_000_000, "threshold": 0.5, "eval_points": 10,
        "metric": "eval/episode_tracking",
        "overrides": {
            "environment.nr_envs": 4096,
            "algorithm.nr_steps": 32,
            "algorithm.minibatch_size": 32768,
            "algorithm.nr_epochs": 4,
            "algorithm.learning_rate": 3e-4,
            "algorithm.compute_dtype": "bfloat16",
            "algorithm.logging_active": False,
        },
    },
    "soccer_lstm": {  # robocup_soccer learning evidence (VERDICT r3 next #7):
        # Booster T1 biped + gait manager, velocity-tracking metric as the
        # locomotion family (the soccer env is the reference's locomotion
        # copy + gait phase, `robocup_soccer/README.md:12-24`).  100M budget:
        # at 50M the curve was still monotonically climbing (0.496, measured
        # round 4); the biped + gait task is harder than the Go2 quadruped.
        "algorithm": "ppo_lstm.tpu", "environment": "locomotion.soccer.tpu",
        "budget": 100_000_000, "threshold": 0.5, "eval_points": 10,
        "metric": "eval/episode_tracking",
        "overrides": {
            "environment.nr_envs": 4096,
            "algorithm.nr_steps": 32,
            "algorithm.nr_minibatches": 4,
            "algorithm.nr_epochs": 4,
            "algorithm.learning_rate": 3e-4,
            "algorithm.rnn_hidden_dim": 128,
            "algorithm.logging_active": False,
        },
    },
}

# ---- family spot checks: final return threshold on small classic tasks ----
_PENDULUM_OFFPOLICY = {
    "algorithm.learning_starts": 1_000,
    "algorithm.buffer_size": 100_000, "algorithm.batch_size": 128,
    "algorithm.logging_frequency": 2_000, "environment.nr_envs": 8,
}
for _name, _algo in [
    ("td3", "td3.tpu"), ("ddpg", "ddpg.tpu"), ("redq", "redq.tpu"),
    ("tqc", "tqc.tpu"), ("droq", "droq.tpu"), ("crossq", "crossq.tpu"),
    ("mpo", "mpo.tpu"), ("fastsac", "fastsac.tpu"),
]:
    RUNS[f"pendulum_spot_{_name}"] = {
        "algorithm": _algo, "environment": "classic.pendulum.tpu",
        "budget": 100_000, "threshold": -500.0, "eval_points": 8,
        "overrides": dict(_PENDULUM_OFFPOLICY),
    }
# FastSAC's locomotion recipe assumes O(1) per-step rewards; Pendulum's raw
# returns (~-500 at gamma 0.97) need a matching categorical value support.
RUNS["pendulum_spot_fastsac"]["overrides"].update({
    "algorithm.v_min": -800.0, "algorithm.v_max": 100.0,
})
# MPO's E/M machinery needs a reference-like update:data ratio (the
# reference runs 1 update / 4 env steps, `mpo/flax/default_config.py:24`);
# at nr_envs=8 the fused loop gives only 1/8, so run fewer envs, plus the
# reference-default observation normalizer.
RUNS["pendulum_spot_mpo"]["budget"] = 150_000
RUNS["pendulum_spot_mpo"]["threshold"] = -800.0
RUNS["pendulum_spot_mpo"]["overrides"].update({
    "algorithm.batch_size": 256,
    "algorithm.enable_observation_normalization": True,
    "environment.nr_envs": 4,
})
# MPO's convergence rate under this recipe spans a wide band and its
# periodic-hard-target E/M cycle makes late evals oscillate (10 measured
# draws; see results/pendulum_spot_mpo_basin_probe.json — fused/chunked/
# parallel paths verified numerically equivalent, reference-matched target
# periods).  The -800 bar separates "learning" (every measured draw's curve
# descends from -1500 and touches <= -350) from the ~-1500 never-learns
# regime of a mis-calibrated recipe (no obs normalizer / starved update
# ratio).  Record with serial seeds: vmapped lanes converge slower within
# this budget (measured in the probe).
RUNS["pendulum_spot_espo"] = {
    # ESPO runs FULL-batch epochs (no minibatches), so it needs smaller
    # rollouts + more epochs than PPO for the same number of grad steps
    "algorithm": "espo.tpu", "environment": "classic.pendulum.tpu",
    "budget": 400_000, "threshold": -700.0, "eval_points": 4,
    "overrides": {
        "algorithm.nr_steps": 128, "algorithm.nr_epochs": 20,
        "algorithm.learning_rate": 1e-3, "algorithm.gamma": 0.9,
        "algorithm.action_clipping_and_rescaling": True,  # Pendulum torque is [-2, 2]
        "environment.nr_envs": 8,
    },
}
for _name, _algo in [("dqn", "dqn.tpu"), ("pqn", "pqn.tpu"),
                     ("ddqn", "ddqn.tpu"), ("c51", "c51.tpu"),
                     ("dqn_hl_gauss", "dqn_hl_gauss.tpu")]:
    RUNS[f"cartpole_spot_{_name}"] = {
        "algorithm": _algo, "environment": "classic.cart_pole.tpu",
        "budget": 250_000, "threshold": 250.0, "eval_points": 6,
        "overrides": {"environment.nr_envs": 8},
    }
# DQN's flat-task defaults decay epsilon over the FULL 250k budget (mean
# eps ~0.5) and hard-refresh targets every 8k steps — recalibrate both to
# the budget so greedy behavior gets train time (cleanrl-style 50% fraction).
for _name in ["dqn", "ddqn", "c51", "dqn_hl_gauss"]:
    RUNS[f"cartpole_spot_{_name}"]["overrides"].update({
        "algorithm.epsilon_decay_steps": 125_000,
        "algorithm.target_update_frequency": 2_000,
        "algorithm.learning_rate": 1e-3,
        "algorithm.batch_size": 128,
    })
for _name in ["c51", "dqn_hl_gauss"]:  # distributional heads need the
    RUNS[f"cartpole_spot_{_name}"]["overrides"].update({
        "algorithm.v_min": 0.0, "algorithm.v_max": 500.0,  # CartPole return support
    })
# The DQN family's greedy tail oscillates on CartPole (the classic
# forgetting wobble); at 250k individual seeds tail-sample just under the
# 250 bar (dqn 247, ddqn 220, hl_gauss 144/250 — c51's wider distributional
# head is stable at 420-500).  Give them the cleanrl-scale 400k budget
# (decay still 50%) so the tail average is past the wobble.
for _name in ["dqn", "ddqn", "dqn_hl_gauss"]:
    RUNS[f"cartpole_spot_{_name}"]["budget"] = 400_000
    RUNS[f"cartpole_spot_{_name}"]["overrides"]["algorithm.epsilon_decay_steps"] = 200_000

# ---- remaining continuous-control families on Pendulum --------------------
for _name, _algo in [
    ("sac", "sac.tpu"), ("fasttd3", "fasttd3.tpu"), ("aqe", "aqe.tpu"),
    ("bro", "bro.tpu"), ("xqc", "xqc.tpu"), ("simba", "simba.tpu"),
    ("simbav2", "simbav2.tpu"), ("flashsac", "flashsac.tpu"),
    ("fastmpo", "fastmpo.tpu"),
]:
    RUNS[f"pendulum_spot_{_name}"] = {
        "algorithm": _algo, "environment": "classic.pendulum.tpu",
        "budget": 100_000, "threshold": -500.0, "eval_points": 8,
        "overrides": dict(_PENDULUM_OFFPOLICY),
    }
RUNS["pendulum_spot_fasttd3"]["overrides"].update({
    "algorithm.v_min": -800.0, "algorithm.v_max": 100.0,  # see fastsac note
})
# categorical/HL-Gauss critics need a value support that covers Pendulum's
# raw returns (see the fastsac note above).
for _name in ["xqc", "fastmpo"]:
    RUNS[f"pendulum_spot_{_name}"]["overrides"].update({
        "algorithm.v_min": -800.0, "algorithm.v_max": 100.0,
    })
# SimbaV2/FlashSAC: the discounted-return reward normalizer (reference
# semantics, normalizer.py:30-60) is tuned for MuJoCo-style reward scales;
# on Pendulum's all-negative returns it compresses rewards ~100x against a
# +-5 support and stalls learning (measured: flat -1200 with normalizers at
# any gamma/support; clean learning without).  The spot checks therefore
# validate the family's LEARNING MACHINERY with normalizers off and a
# raw-return support — the normalizers themselves follow the reference
# symbol-for-symbol and stay default-on for locomotion-class tasks.
for _name in ["simbav2", "flashsac"]:
    RUNS[f"pendulum_spot_{_name}"]["budget"] = 150_000
    RUNS[f"pendulum_spot_{_name}"]["overrides"].update({
        "algorithm.gamma": 0.9,
        "algorithm.v_min": -300.0, "algorithm.v_max": 0.0,
        "algorithm.enable_reward_normalization": False,
    })
RUNS["pendulum_spot_simbav2"]["overrides"][
    "algorithm.enable_observation_normalization"] = False
# BRO's default recipe is tuned for UTD 10 resets on long runs; at a 100k
# spot check disable the periodic resets so the curve is interpretable
RUNS["pendulum_spot_bro"]["overrides"].update({
    "algorithm.reset_interval": 10**9,
})
# On-policy variants at the tuned PPO pendulum recipe
for _name, _algo in [("ppo_dtrl", "ppo_dtrl.tpu"), ("reppo", "reppo.tpu")]:
    RUNS[f"pendulum_spot_{_name}"] = {
        "algorithm": _algo, "environment": "classic.pendulum.tpu",
        "budget": 300_000, "threshold": -700.0, "eval_points": 6,
        "overrides": {
            "algorithm.nr_steps": 256, "algorithm.learning_rate": 1e-3,
            "algorithm.gamma": 0.9, "environment.nr_envs": 8,
        },
    }
RUNS["pendulum_spot_ppo_dtrl"]["overrides"].update({
    "algorithm.minibatch_size": 512, "algorithm.nr_epochs": 10,
})
# REPPO is a massively-parallel recipe: its defaults assume 4096 envs x
# 128 steps with 128 minibatches (`reppo/flax_full_jit/default_config.py`);
# at 8 envs that is an 8-SAMPLE minibatch.  Spot-check it at a scaled-down
# version of its own regime (256 envs, 4096-sample minibatches), with gamma
# and the HL-Gauss support adapted to Pendulum's raw return scale.
RUNS["pendulum_spot_reppo"]["budget"] = 4_000_000
RUNS["pendulum_spot_reppo"]["overrides"] = {
    "algorithm.nr_steps": 128, "algorithm.nr_minibatches": 8,
    "algorithm.gamma": 0.9,
    "algorithm.v_min": -400.0, "algorithm.v_max": 50.0,
    "environment.nr_envs": 256,
}

# ---- memory suite: velocity-masked Pendulum (POMDP) ------------------------
# Observation is [cos th, sin th] only — th_dot must be reconstructed from
# history, so memoryless PPO must FAIL ("expect": "below") while every
# memory mechanism must PASS.  This is the carry-wiring validation VERDICT
# r2 asked for: a bug reducing a recurrent variant to feedforward flips its
# result here.
# lr 5e-4: at 1e-3 the memory variants oscillate late in training (LSTM
# seed 2 hit -286 mid-run then regressed to a -721 final, measured round 4);
# 5e-4 passes all seeds with margin and smoother tails.
_MASKED = {
    "environment.nr_envs": 8, "environment.mask_velocity": True,
    "algorithm.nr_steps": 256, "algorithm.learning_rate": 5e-4,
    "algorithm.gamma": 0.9,
}
for _name, _algo in [("gru", "ppo_gru.tpu"), ("lstm", "ppo_lstm.tpu"),
                     ("transformer", "ppo_transformer.tpu"),
                     ("mamba2", "ppo_mamba2.tpu")]:
    RUNS[f"pendulum_masked_{_name}"] = {
        "algorithm": _algo, "environment": "classic.pendulum.tpu",
        "budget": 400_000, "threshold": -700.0, "eval_points": 8,
        "overrides": {**_MASKED, "algorithm.nr_minibatches": 4,
                      "algorithm.nr_epochs": 10},
    }
# attention-based memory is the slowest learner of the suite (all seeds
# improve strongly over the feedforward control but 400k passes only 2/3
# seeds); double its budget so the pass is seed-robust
RUNS["pendulum_masked_transformer"]["budget"] = 800_000
RUNS["pendulum_masked_transformer"]["eval_points"] = 10
RUNS["pendulum_masked_ppo"] = {  # feedforward control: must score BELOW
    "algorithm": "ppo.tpu", "environment": "classic.pendulum.tpu",
    "budget": 400_000, "threshold": -700.0, "eval_points": 8,
    "expect": "below",
    "overrides": {**_MASKED, "algorithm.minibatch_size": 512,
                  "algorithm.nr_epochs": 10},
}
RUNS["pendulum_masked_history_window"] = {
    "algorithm": "ppo_history_window.tpu", "environment": "classic.pendulum.tpu",
    "budget": 400_000, "threshold": -700.0, "eval_points": 8,
    "overrides": {**_MASKED, "algorithm.minibatch_size": 512,
                  "algorithm.nr_epochs": 10, "algorithm.window_length": 4},
}
RUNS["pendulum_masked_memory_actions"] = {
    # the hardest mechanism: memory exists only through the action space
    # (`rl_x/algorithms/ppo_memory_actions/flax_full_jit/policy.py:42-52`);
    # the policy must learn to encode th_dot into its extra outputs while
    # also solving the control problem, so it gets a larger budget than the
    # architectural memory variants.
    "algorithm": "ppo_memory_actions.tpu", "environment": "classic.pendulum.tpu",
    "budget": 1_200_000, "threshold": -700.0, "eval_points": 12,
    "overrides": {**_MASKED, "algorithm.minibatch_size": 512,
                  "algorithm.nr_epochs": 10,
                  "algorithm.memory_action_dimension": 4},
}
RUNS["pendulum_masked_memory_actions_tuned"] = {
    # calibrated variant (4-dim @ 1.2M recorded failing at -988): 2-dim
    # +-10 memory channel (reference clip semantics), 4x budget.  Memory
    # through the action space gets no BPTT path — the write is credited
    # only via advantage correlation — so it needs far more experience than
    # the architectural memory variants.
    "algorithm": "ppo_memory_actions.tpu", "environment": "classic.pendulum.tpu",
    "budget": 4_800_000, "threshold": -700.0, "eval_points": 12,
    "overrides": {**_MASKED, "algorithm.minibatch_size": 512,
                  "algorithm.nr_epochs": 10,
                  "algorithm.memory_action_dimension": 2},
}


def run_ours(name, spec, device, seed, parallel_seeds=1):
    import jax

    overrides = dict(spec["overrides"])
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "float32")
    else:
        # big fused programs (locomotion + LSTM) compile slowly over the
        # hosted-TPU tunnel; persist compiles across runs
        cache_dir = os.environ.get("RLX_BENCH_CACHE", "/tmp/rlx_tpu_jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # tunneled transports drop single multi-minute device executions;
        # chunked mode keeps each device call bounded (one eval interval)
        overrides["runner.chunked_train"] = True
        # host callbacks (io_callback/debug.callback) are UNIMPLEMENTED on
        # the axon TPU plugin: all logging must stay in-program
        overrides["algorithm.logging_active"] = False

    from rlx_tpu.config import create_model, make_config

    budget = spec["budget"]
    eval_freq = max(budget // spec["eval_points"], 1)
    # on-policy programs require the eval cadence to align with the rollout
    # batch; round down to the nearest multiple
    nr_steps = overrides.get("algorithm.nr_steps")
    nr_envs = overrides.get("environment.nr_envs")
    if nr_steps and nr_envs:
        batch = nr_steps * nr_envs
        eval_freq = max(eval_freq // batch, 1) * batch
    overrides.update({
        "algorithm.total_timesteps": budget,
        "algorithm.evaluation_and_save_frequency": eval_freq,
        "algorithm.evaluation_active": True,
        "environment.seed": seed,
    })
    if parallel_seeds > 1:
        # ONE vmapped program trains all seeds together (round-5 capability
        # in every core); incompatible with chunked mode and callbacks —
        # prefer for runs whose single execution the tunnel tolerates
        overrides.update({
            "algorithm.nr_parallel_seeds": parallel_seeds,
            "runner.chunked_train": False,
            "algorithm.logging_active": False,
            "runner.save_model": False,
        })
    config = make_config(spec["algorithm"], spec["environment"], **overrides)
    model = create_model(config)
    start = time.time()
    model.train()
    wall = time.time() - start
    hist = model.eval_history
    assert hist is not None, "evaluation_active run must produce eval_history"
    metric = spec.get("metric", "eval/episode_return")

    def curve_from(select):
        out = {
            "steps": [int(s) for s in hist["steps"]],
            "returns": [float(r) for r in select(hist[metric])],
            "metric": metric,
            "wall_s": round(wall, 2),
        }
        for extra_key, out_key in [("eval/episode_length", "episode_lengths"),
                                   ("eval/episode_return", "episode_returns")]:
            if extra_key in hist and extra_key != metric:
                out[out_key] = [float(x) for x in select(hist[extra_key])]
        # record any remaining eval diagnostics (e.g. eval/policy_std)
        for k, v in hist.items():
            if k.startswith("eval/") and k != metric and k not in (
                "eval/episode_length", "eval/episode_return"
            ):
                out[k.split("eval/", 1)[1]] = [float(x) for x in select(v)]
        return out

    if parallel_seeds > 1:
        # [seeds, points] leaves -> one curve per vmap lane; wall_s is the
        # SHARED wall clock of the single vmapped program
        return [curve_from(lambda v, lane=lane: v[lane]) for lane in range(parallel_seeds)]
    return curve_from(lambda v: v)


def _final(curve):
    tail = curve["returns"][-3:]
    return sum(tail) / len(tail)


_BOX_LINE = re.compile(r"│ (\S+)\s*│ (-?[0-9.e+-]+)\s*│")


def run_reference(spec, budget, eval_points, seed):
    """Run the reference flax implementation in a subprocess; parse its
    console boxes into an eval curve (metric names from
    `rl_x/algorithms/ppo/flax/ppo.py:366-385`)."""
    ref = spec["reference"]
    eval_freq = max(budget // eval_points, 1)
    # the reference asserts eval_freq % (nr_steps * nr_envs) == 0
    # (`rl_x/algorithms/ppo/flax/ppo.py:63-65`); align to its batch
    overrides = ref.get("algorithm_overrides", {})
    ref_batch = int(overrides.get("algorithm.nr_steps", 2048)) * ref["nr_envs"]
    if ref["algorithm"].startswith("ppo"):
        eval_freq = max(eval_freq // ref_batch, 1) * ref_batch
    shim = os.path.join(REPO, "benchmarks", "_refshim")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{shim}:{REFERENCE}"
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, os.path.join(shim, "run_reference.py"),
        "--runner.mode=train", f"--algorithm.name={ref['algorithm']}",
        f"--environment.name={ref['environment']}",
        f"--environment.type={ref['type']}",
        f"--environment.nr_envs={ref['nr_envs']}",
        f"--environment.seed={seed}",
        "--runner.track_console=True", "--runner.track_tb=False",
        "--runner.track_wandb=False", "--runner.save_model=False",
        "--algorithm.device=cpu",
        f"--algorithm.total_timesteps={budget}",
        f"--algorithm.evaluation_frequency={eval_freq}",
        "--algorithm.evaluation_episodes=5",
    ] + [f"--{k}={v}" for k, v in overrides.items()]
    start = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd="/tmp")
    wall = time.time() - start
    if proc.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    steps, returns, cur_step = [], [], None
    for line in proc.stdout.splitlines():
        m = _BOX_LINE.search(line)
        if not m:
            continue
        key, value = m.group(1), float(m.group(2))
        if key == "steps/nr_env_steps":
            cur_step = int(value)
        elif key == "eval/episode_return" and cur_step is not None:
            steps.append(cur_step)
            returns.append(value)
    return {"steps": steps, "returns": returns, "wall_s": round(wall, 2)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("run", nargs="?", help="named run (see --list)")
    parser.add_argument("--list", action="store_true")
    parser.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--seeds", default="",
                        help="comma-separated seeds; runs each and records "
                             "per-seed finals + spread (passed = ALL pass)")
    parser.add_argument("--parallel-seeds", type=int, default=1,
                        help="train N seeds in ONE vmapped program "
                             "(nr_parallel_seeds; ~Nx wall-clock saving on "
                             "TPU for runs the tunnel tolerates unchunked)")
    parser.add_argument("--with-reference", action="store_true")
    parser.add_argument("--tag", default="", help="suffix for the results file")
    args = parser.parse_args()

    if args.list or not args.run:
        for name, spec in RUNS.items():
            ref = " [head-to-head]" if "reference" in spec else ""
            print(f"{name:28s} {spec['algorithm']:16s} {spec['environment']:32s} "
                  f"budget={spec['budget']:>11,} threshold={spec['threshold']}{ref}")
        return

    spec = RUNS[args.run]
    result = {
        "name": args.run, "algorithm": spec["algorithm"],
        "environment": spec["environment"], "budget": spec["budget"],
        "threshold": spec["threshold"], "seed": args.seed, "device": args.device,
    }
    if args.with_reference:
        if "reference" not in spec:
            raise SystemExit(f"{args.run} has no reference head-to-head spec")
        print(f"[curves] running REFERENCE {spec['reference']['algorithm']} "
              f"on {spec['reference']['type']} ...", flush=True)
        result["reference"] = run_reference(spec, spec["budget"], spec["eval_points"], args.seed)
        print(f"[curves] reference curve: {result['reference']['returns']}", flush=True)

    if args.parallel_seeds > 1:
        print(f"[curves] running OURS {spec['algorithm']} on {spec['environment']} "
              f"with {args.parallel_seeds} parallel seeds (one vmapped program) ...",
              flush=True)
        lanes = run_ours(args.run, spec, args.device, args.seed,
                         parallel_seeds=args.parallel_seeds)
        seeds = list(range(args.parallel_seeds))
        curves = dict(enumerate(lanes))
        for lane, c in curves.items():
            print(f"[curves] lane {lane} curve: {c['returns']}", flush=True)
        result["parallel_seeds"] = args.parallel_seeds
    else:
        seeds = [int(s) for s in args.seeds.split(",") if s] or [args.seed]
        curves = {}
        for s in seeds:
            print(f"[curves] running OURS {spec['algorithm']} on {spec['environment']} "
                  f"seed={s} ...", flush=True)
            curves[s] = run_ours(args.run, spec, args.device, s)
            print(f"[curves] seed {s} curve: {curves[s]['returns']}", flush=True)

    result["ours"] = curves[seeds[0]]
    finals = [_final(curves[s]) for s in seeds]
    final = sum(finals) / len(finals)
    result["final_return"] = final
    # "expect": "below" marks a deliberate NEGATIVE control (e.g. the
    # memoryless policy on a memory-requiring task): it passes by scoring
    # UNDER the threshold the memory variants must clear.
    expect = spec.get("expect", "above")
    result["expect"] = expect
    if expect == "below":
        per_seed_passed = [bool(f < spec["threshold"]) for f in finals]
    else:
        per_seed_passed = [bool(f >= spec["threshold"]) for f in finals]
    result["passed"] = all(per_seed_passed)
    if len(seeds) > 1:
        result["seeds"] = seeds
        result["per_seed_final"] = [round(f, 2) for f in finals]
        result["per_seed_passed"] = per_seed_passed
        result["final_spread"] = round(max(finals) - min(finals), 2)
        result["ours_per_seed"] = {str(s): curves[s] for s in seeds}

    os.makedirs(RESULTS_DIR, exist_ok=True)
    suffix = f"_{args.tag}" if args.tag else ""
    path = os.path.join(RESULTS_DIR, f"{args.run}{suffix}.json")
    # keep a previously recorded reference overlay when re-recording ours
    if "reference" not in result and os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            if "reference" in prev:
                result["reference"] = prev["reference"]
        except (json.JSONDecodeError, OSError):
            pass
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[curves] {args.run}: final={final:.1f} threshold={spec['threshold']} "
          f"passed={result['passed']} -> {path}", flush=True)
    if not result["passed"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
