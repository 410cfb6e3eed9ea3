"""Experiment orchestration: CLI parse, framework setup, train/test dispatch.

Re-implements the contract of `rl_x/runner/runner.py:36-385`:
- pre-parse of ``--algorithm.name`` / ``--environment.name`` / ``--runner.mode``
  from argv before absl sees them (they determine which defaults register,
  `runner.py:206-229`);
- dynamic import of the chosen algorithm/environment leaf packages, which
  self-register (`runner.py:232-247`); third-party packages via
  ``implementation_package_names``;
- startup compatibility check of space/interface types (`runner.py:83-91`);
- JAX configuration: default matmul precision (bfloat16 on TPU),
  persistent compilation cache, optional platform pin (`runner.py:130-174`);
- three ml_collections config namespaces exposed as absl dotted flags
  (`runner.py:179-181`);
- run-dir creation, tracker init, model construct-or-load, try/finally
  cleanup (`runner.py:278-353`).

TPU additions: multi-host ``jax.distributed`` bootstrap before any device
use, and mesh controls in the runner namespace.
"""

import importlib
import os
import sys
from pathlib import Path

from absl import app, flags
from ml_collections import config_dict, config_flags

from rlx_tpu.algorithms.algorithm_manager import (
    get_algorithm_config,
    get_algorithm_general_properties,
    get_algorithm_model_class,
)
from rlx_tpu.environments.environment_manager import (
    get_environment_config,
    get_environment_create_env,
    get_environment_general_properties,
)
from rlx_tpu.runner.default_config import get_config as get_runner_config
from rlx_tpu.runner.runner_mode import RunnerMode
from rlx_tpu.utils.logging import setup_logger

rlx_logger = setup_logger()

DEFAULT_ALGORITHM = "ppo.tpu"
DEFAULT_ENVIRONMENT = "classic.pendulum.tpu"


class Runner:
    def __init__(self, implementation_package_names=("rlx_tpu",)):
        self.implementation_package_names = list(implementation_package_names)

        self.algorithm_name, self.environment_name, self.mode = self.parse_arguments()

        # JAX must be configured before any import that can initialize the
        # backend (orbax touches it at import time).
        runner_config = get_runner_config()
        self.configure_jax(runner_config)

        self.import_implementation("environments", self.environment_name)
        self.import_implementation("algorithms", self.algorithm_name)

        algorithm_properties = get_algorithm_general_properties(self.algorithm_name)
        environment_properties = get_environment_general_properties(self.environment_name)
        self.check_compatibility(algorithm_properties, environment_properties)

        self._config_holders = {
            "runner": config_flags.DEFINE_config_dict("runner", runner_config),
            "algorithm": config_flags.DEFINE_config_dict(
                "algorithm", get_algorithm_config(self.algorithm_name)
            ),
            "environment": config_flags.DEFINE_config_dict(
                "environment", get_environment_config(self.environment_name)
            ),
        }

    # ------------------------------------------------------------- bootstrap

    def parse_arguments(self):
        """Strip the three bootstrap flags from argv (reference:
        `rl_x/runner/runner.py:206-229`)."""
        values = {
            "algorithm.name": DEFAULT_ALGORITHM,
            "environment.name": DEFAULT_ENVIRONMENT,
            "runner.mode": RunnerMode.TRAIN,
        }
        kept = [sys.argv[0]]
        i = 1
        while i < len(sys.argv):
            arg = sys.argv[i]
            matched = False
            for name in values:
                flag = f"--{name}"
                if arg == flag and i + 1 < len(sys.argv):
                    values[name] = sys.argv[i + 1]
                    i += 2
                    matched = True
                    break
                if arg.startswith(flag + "="):
                    values[name] = arg.split("=", 1)[1]
                    i += 1
                    matched = True
                    break
            if not matched:
                kept.append(sys.argv[i])
                i += 1
        sys.argv = kept
        return values["algorithm.name"], values["environment.name"], values["runner.mode"]

    def import_implementation(self, kind, dotted_name):
        """Import `<pkg>.<kind>.<dotted_name>` from the first implementation
        package that has it; the leaf __init__ self-registers."""
        errors = []
        for pkg in self.implementation_package_names:
            module_path = f"{pkg}.{kind}.{dotted_name}"
            try:
                importlib.import_module(module_path)
                return
            except ModuleNotFoundError as e:
                errors.append(f"{module_path}: {e}")
        raise ValueError(f"Could not import {kind} '{dotted_name}'. Tried: {errors}")

    def check_compatibility(self, algorithm_properties, environment_properties):
        problems = []
        if environment_properties.action_space_type not in algorithm_properties.action_space_types:
            problems.append(f"action space {environment_properties.action_space_type}")
        if environment_properties.observation_space_type not in algorithm_properties.observation_space_types:
            problems.append(f"observation space {environment_properties.observation_space_type}")
        if environment_properties.data_interface_type not in algorithm_properties.data_interface_types:
            problems.append(f"data interface {environment_properties.data_interface_type}")
        if problems:
            raise ValueError(
                f"Algorithm '{self.algorithm_name}' does not support environment "
                f"'{self.environment_name}': incompatible {', '.join(problems)}"
            )

    def configure_jax(self, runner_config):
        # Peek pre-parse values from raw argv (reference `runner.py:117-140`).
        def peek(flag, default):
            for i, arg in enumerate(sys.argv):
                if arg == f"--{flag}" and i + 1 < len(sys.argv):
                    return sys.argv[i + 1]
                if arg.startswith(f"--{flag}="):
                    return arg.split("=", 1)[1]
            return default

        import jax

        coordinator = peek("runner.coordinator_address", runner_config.coordinator_address)
        if coordinator:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=int(peek("runner.num_processes", runner_config.num_processes)),
                process_id=int(peek("runner.process_id", runner_config.process_id)),
            )

        precision = peek("runner.jax_default_matmul_precision", runner_config.jax_default_matmul_precision)
        jax.config.update("jax_default_matmul_precision", precision)

        cache_dir = peek("runner.jax_compilation_cache_dir", runner_config.jax_compilation_cache_dir)
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        device = peek("runner.device", runner_config.device)
        if device:
            jax.config.update("jax_platforms", device)

    # ------------------------------------------------------------------- run

    def run(self):
        if self.mode == RunnerMode.TRAIN:
            app.run(self._train)
        elif self.mode == RunnerMode.TEST:
            app.run(self._test)
        elif self.mode == RunnerMode.SHOW_CONFIG:
            app.run(self._show_config)
        else:
            raise ValueError(f"Unknown runner mode: {self.mode}")

    def _combined_config(self):
        config = config_dict.ConfigDict()
        config.runner = self._config_holders["runner"].value
        config.algorithm = self._config_holders["algorithm"].value
        config.environment = self._config_holders["environment"].value
        return config

    def _explicitly_set_algorithm_params(self):
        return [
            f"algorithm.{name.split('algorithm.', 1)[1]}"
            for name in flags.FLAGS
            if name.startswith("algorithm.") and flags.FLAGS[name].present
        ]

    def _make_run_path(self, config):
        run_name = config.runner.run_name or "run"
        run_path = Path("runs") / config.runner.project_name / config.runner.exp_name / run_name
        run_path.mkdir(parents=True, exist_ok=True)
        return str(run_path.resolve())

    def _make_writer(self, config, run_path):
        writer = None
        if config.runner.track_tb:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(run_path, "tb"))
        if config.runner.track_wandb:
            try:
                import wandb

                wandb.init(
                    project=config.runner.project_name,
                    entity=config.runner.wandb_entity or None,
                    group=config.runner.exp_name,
                    name=config.runner.run_name or None,
                    notes=config.runner.notes,
                    config=config.to_dict(),
                    dir=run_path,
                )
                wandb.define_metric("global_step")
                wandb.define_metric("*", step_metric="global_step")
            except Exception as e:  # pragma: no cover
                rlx_logger.warning(f"wandb init failed ({e}); continuing without wandb")
        self._log_run_provenance(config, run_path)
        return writer

    def _log_run_provenance(self, config, run_path):
        """Run provenance capture (reference `rl_x/runner/runner.py:301-320`):
        pip freeze, git commit + working-tree diff patch, SLURM job id.
        Always written into the run directory (``provenance.json`` +
        ``diff.patch``) so provenance survives without wandb; attached to
        the wandb config when tracking is active."""
        import json
        import subprocess

        provenance = {}
        try:
            packages = subprocess.check_output(
                [sys.executable, "-m", "pip", "freeze"], stderr=subprocess.DEVNULL
            ).decode().splitlines()
            provenance["python_packages"] = dict(
                p.split("==", 1) for p in packages if "==" in p
            )
        except Exception as e:
            rlx_logger.warning(f"Could not capture pip freeze: {e}")
        try:
            project_dir = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            provenance["git_commit_hash"] = subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=project_dir, stderr=subprocess.DEVNULL
            ).decode().strip()
            git_diff = subprocess.check_output(
                ["git", "diff"], cwd=project_dir, stderr=subprocess.DEVNULL
            ).decode()
            with open(os.path.join(run_path, "diff.patch"), "w") as f:
                f.write(git_diff)
        except Exception as e:
            rlx_logger.warning(f"Could not capture git state: {e}")
        if "SLURM_JOB_ID" in os.environ:
            provenance["SLURM_JOB_ID"] = os.environ["SLURM_JOB_ID"]
        with open(os.path.join(run_path, "provenance.json"), "w") as f:
            json.dump(provenance, f, indent=1)

        if config.runner.track_wandb:
            try:
                import wandb

                if wandb.run is not None:
                    wandb.config.update({k: v for k, v in provenance.items()})
                    diff_path = os.path.join(run_path, "diff.patch")
                    if os.path.exists(diff_path):
                        wandb.save(diff_path, base_path=run_path)
            except Exception:
                pass

    def _train(self, _argv):
        config = self._combined_config()
        from rlx_tpu.ops import _dispatch as ops_dispatch

        ops_dispatch.set_mode(config.runner.pallas_kernels)
        run_path = self._make_run_path(config)
        writer = self._make_writer(config, run_path)

        train_env, eval_env = get_environment_create_env(self.environment_name)(config)
        model_class = get_algorithm_model_class(self.algorithm_name)()

        if config.runner.load_model:
            model = model_class.load(
                config, train_env, eval_env, run_path, writer,
                self._explicitly_set_algorithm_params(),
            )
        else:
            model = model_class(config, train_env, eval_env, run_path, writer)

        try:
            if config.runner.profile_dir:
                import jax

                with jax.profiler.trace(config.runner.profile_dir):
                    model.train()
            else:
                model.train()
        finally:
            train_env.close()
            eval_env.close()
            if writer is not None:
                writer.close()
            if config.runner.track_wandb:
                try:
                    import wandb

                    wandb.finish()
                except Exception:
                    pass

    def _test(self, _argv):
        config = self._combined_config()
        from rlx_tpu.ops import _dispatch as ops_dispatch

        ops_dispatch.set_mode(config.runner.pallas_kernels)
        run_path = self._make_run_path(config)
        writer = self._make_writer(config, run_path)

        train_env, eval_env = get_environment_create_env(self.environment_name)(config)
        model_class = get_algorithm_model_class(self.algorithm_name)()

        if config.runner.load_model:
            model = model_class.load(
                config, train_env, eval_env, run_path, writer,
                self._explicitly_set_algorithm_params(),
            )
        else:
            model = model_class(config, train_env, eval_env, run_path, writer)

        try:
            model.test(config.runner.nr_test_episodes)
            if config.runner.render_video:
                from rlx_tpu.render import render_rollout

                frames = render_rollout(model, config.runner.render_video)
                rlx_logger.info(
                    f"rendered {frames} frames to {config.runner.render_video}"
                )
            if config.runner.render_interactive:
                # opt-in GLFW window (requires a GL stack + display);
                # reference viewer semantics: rlx_tpu/render/interactive.py
                from rlx_tpu.render.interactive import watch_rollout

                xml_path = getattr(model.eval_env, "xml_path", None)
                if xml_path is None:
                    rlx_logger.warning(
                        "runner.render_interactive: env exposes no xml_path; skipping"
                    )
                else:
                    steps = watch_rollout(model, xml_path)
                    rlx_logger.info(f"interactive viewer closed after {steps} steps")
        finally:
            train_env.close()
            eval_env.close()

    def _show_config(self, _argv):
        config = self._combined_config()
        rlx_logger.info(f"\n{config}")
