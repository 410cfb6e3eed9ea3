"""Record reference head-to-head curves for BASELINE configs 2 and 3
(VERDICT r3 next #3): run the REFERENCE's own flax implementations
(`rl_x/algorithms/ppo/flax/ppo.py`, `rl_x/algorithms/sac/flax/sac.py`) on
Hopper-v5 / HalfCheetah-v5 through benchmarks/_refshim, then merge the
resulting eval curve into the existing benchmarks/results/<run>.json as the
"reference" key (the pendulum_ppo pattern).

The reference's host-driven loop performs one jitted call per env step; on
this 2-core box that is O(10) env-steps/s, so budgets are truncated
(recorded in "reference.note").  Usage:

    python benchmarks/record_reference_overlays.py hopper_ppo --budget 49152
    python benchmarks/record_reference_overlays.py halfcheetah_sac --budget 24576
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curves import RUNS, RESULTS_DIR, run_reference


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("run", choices=[n for n, s in RUNS.items() if "reference" in s])
    parser.add_argument("--budget", type=int, default=0,
                        help="truncated reference budget (0 = the run's full budget)")
    parser.add_argument("--eval-points", type=int, default=8)
    parser.add_argument("--seed", type=int, default=1)
    args = parser.parse_args()

    spec = RUNS[args.run]
    budget = args.budget or spec["budget"]
    print(f"[overlay] running reference {spec['reference']['algorithm']} on "
          f"{spec['reference']['type']} for {budget} steps ...", flush=True)
    ref = run_reference(spec, budget, args.eval_points, args.seed)
    if budget != spec["budget"]:
        ref["note"] = (
            f"truncated reference budget ({budget} of {spec['budget']} steps): the "
            "reference's host-loop flax implementation steps the env once per jitted "
            "call (~10 env-steps/s on this 2-core box); compare against the ours "
            "curve over the same step range"
        )
    ref["budget"] = budget
    path = os.path.join(RESULTS_DIR, f"{args.run}.json")
    with open(path) as f:
        result = json.load(f)
    result["reference"] = ref
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[overlay] wrote reference curve ({len(ref['returns'])} points, "
          f"wall {ref['wall_s']}s) -> {path}", flush=True)
    print(f"[overlay] reference returns: {ref['returns']}", flush=True)


if __name__ == "__main__":
    main()
