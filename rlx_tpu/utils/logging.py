"""Logging sinks: console box / TensorBoard / wandb (optional).

The reference duplicates log/log_console/start_logging/end_logging in every
algorithm (`rl_x/algorithms/ppo/flax_full_jit/ppo.py:352-379`); here one
shared ``MetricsLogger`` implements the identical contract, including the
box-drawing console table, per-commit wandb dict cache with ``global_step``
as the universal step metric, and the reference's metric namespace schema
(rollout/*, env_info/*, eval/*, steps/*, time/*, loss/*, ...).

wandb is an optional dependency (not installed in this image): tracking
degrades gracefully to a no-op with a one-time warning.
"""

import logging
import logging.handlers
import sys

import numpy as np

try:
    import wandb  # noqa: F401

    HAS_WANDB = True
except Exception:  # pragma: no cover - wandb not installed in this image
    wandb = None
    HAS_WANDB = False

rlx_logger = logging.getLogger("rlx_tpu")


def setup_logger():
    """Console logger with buffered flush, mirroring `rl_x/runner/runner.py:184-203`."""
    if getattr(setup_logger, "_done", False):
        return rlx_logger
    rlx_logger.setLevel(logging.INFO)
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
    memory_handler = logging.handlers.MemoryHandler(100, flushLevel=logging.ERROR, target=handler)
    rlx_logger.addHandler(memory_handler)
    rlx_logger.propagate = False

    original_info = rlx_logger.info

    def info_with_flush(msg, *args, flush=True, **kwargs):
        original_info(msg, *args, **kwargs)
        if flush:
            memory_handler.flush()

    rlx_logger.info = info_with_flush

    def excepthook(exc_type, exc_value, exc_traceback):
        rlx_logger.error("Uncaught exception", exc_info=(exc_type, exc_value, exc_traceback))

    sys.excepthook = excepthook
    setup_logger._done = True
    return rlx_logger


class MetricsLogger:
    """Uniform sink used by all algorithms."""

    def __init__(self, track_console=False, track_tb=False, track_wandb=False, writer=None):
        self.track_console = track_console
        self.track_tb = track_tb
        self.track_wandb = track_wandb and HAS_WANDB
        if track_wandb and not HAS_WANDB:
            rlx_logger.warning("wandb requested but not installed; disabling wandb tracking")
        self.writer = writer
        self._wandb_cache = {}

    def start(self, step):
        if self.track_wandb:
            self._wandb_cache = {"global_step": int(step)}
        if self.track_console:
            rlx_logger.info("┌" + "─" * 31 + "┬" + "─" * 16 + "┐", flush=False)
        else:
            rlx_logger.info(f"Step: {step}")

    def log(self, name, value, step):
        if self.track_wandb:
            self._wandb_cache[name] = value
        if self.track_tb and self.writer is not None:
            self.writer.add_scalar(name, value, step)
        if self.track_console:
            pretty = np.format_float_positional(value, trim="-")
            rlx_logger.info(f"│ {name.ljust(30)}│ {str(pretty).ljust(14)[:14]} │", flush=False)

    def end(self, wandb_commit=True):
        if self.track_wandb:
            wandb.log(self._wandb_cache, commit=wandb_commit)
        if self.track_console:
            rlx_logger.info("└" + "─" * 31 + "┴" + "─" * 16 + "┘")

    def log_dict(self, metrics, step, wandb_commit=True):
        self.start(step)
        for name, value in metrics.items():
            self.log(name, np.asarray(value), step)
        self.end(wandb_commit)
