"""Background-friendly reference overlay runner (start / parse).

`record_reference_overlays.py` runs the reference synchronously and only
writes its curve if the subprocess completes — unusable for multi-hour
reference budgets on this 2-core box.  This variant tees the reference's
console output to a log file as it runs, so a partially-completed run can
be parsed into a (truncated, honestly-noted) overlay at any time:

    python benchmarks/overlay_bg.py start hopper_ppo --budget 245760 &
    ...hours later...
    python benchmarks/overlay_bg.py parse hopper_ppo

Parsing merges the eval curve into benchmarks/results/<run>.json under the
"reference" key, with a truncation note when fewer steps than the run's
budget were reached (same contract as record_reference_overlays.py).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curves import RUNS, RESULTS_DIR, REPO, REFERENCE, _BOX_LINE

LOG_DIR = os.path.join(REPO, "runs", "overlay_bg")


def log_path(run):
    return os.path.join(LOG_DIR, f"{run}.log")


def start(args):
    spec = RUNS[args.run]
    ref = spec["reference"]
    budget = args.budget or spec["budget"]
    eval_freq = max(budget // args.eval_points, 1)
    overrides = ref.get("algorithm_overrides", {})
    nr_steps = int(overrides.get("algorithm.nr_steps", 2048))
    ref_batch = nr_steps * ref["nr_envs"]
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
        f"--environment.seed={args.seed}",
        "--runner.track_console=True", "--runner.track_tb=False",
        "--runner.track_wandb=False", "--runner.save_model=False",
        "--algorithm.device=cpu",
        f"--algorithm.total_timesteps={budget}",
        f"--algorithm.evaluation_frequency={eval_freq}",
        f"--algorithm.evaluation_episodes={args.eval_episodes}",
    ] + [f"--{k}={v}" for k, v in overrides.items()]
    env["PYTHONUNBUFFERED"] = "1"  # stream console boxes to the log live
    os.makedirs(LOG_DIR, exist_ok=True)
    meta = {"run": args.run, "budget": budget, "seed": args.seed,
            "started": time.time()}
    with open(log_path(args.run) + ".meta", "w") as f:
        json.dump(meta, f)
    with open(log_path(args.run), "w") as logf:
        logf.write(f"# cmd: {' '.join(cmd)}\n")
        logf.flush()
        proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                                env=env, cwd="/tmp")
        print(f"[overlay_bg] started pid {proc.pid} -> {log_path(args.run)}",
              flush=True)
        rc = proc.wait()
    print(f"[overlay_bg] reference run exited rc={rc}", flush=True)


def parse(args):
    with open(log_path(args.run) + ".meta") as f:
        meta = json.load(f)
    steps, returns, cur_step = [], [], None
    with open(log_path(args.run)) as f:
        for line in f:
            m = _BOX_LINE.search(line)
            if not m:
                continue
            key, value = m.group(1), float(m.group(2))
            if key == "steps/nr_env_steps":
                cur_step = int(value)
            elif key == "eval/episode_return" and cur_step is not None:
                steps.append(cur_step)
                returns.append(value)
    if not steps:
        raise SystemExit("no eval points in log yet")
    spec = RUNS[args.run]
    wall = round(time.time() - meta["started"], 2)
    ref = {"steps": steps, "returns": returns, "wall_s": wall,
           "budget": steps[-1]}
    if steps[-1] < spec["budget"]:
        ref["note"] = (
            f"truncated reference budget ({steps[-1]} of {spec['budget']} steps): "
            "the reference's host-loop flax implementation steps the env once per "
            "jitted call on this 2-core box; compare against the ours curve over "
            "the same step range"
        )
    path = os.path.join(RESULTS_DIR, f"{args.run}.json")
    with open(path) as f:
        result = json.load(f)
    prev = result.get("reference", {})
    if prev and prev.get("budget", 0) > steps[-1]:
        raise SystemExit(f"existing overlay covers {prev['budget']} > {steps[-1]} steps; not overwriting")
    if "comparison_note" in prev:
        ref["comparison_note"] = prev["comparison_note"] + " [superseded; see updated curve]"
    result["reference"] = ref
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[overlay_bg] wrote {len(steps)} eval points (to step {steps[-1]}) -> {path}")
    print(f"[overlay_bg] returns: {returns}")


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_start = sub.add_parser("start")
    p_start.add_argument("run", choices=[n for n, s in RUNS.items() if "reference" in s])
    p_start.add_argument("--budget", type=int, default=0)
    p_start.add_argument("--eval-points", type=int, default=10)
    p_start.add_argument("--eval-episodes", type=int, default=3)
    p_start.add_argument("--seed", type=int, default=1)
    p_start.set_defaults(fn=start)
    p_parse = sub.add_parser("parse")
    p_parse.add_argument("run")
    p_parse.set_defaults(fn=parse)
    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
