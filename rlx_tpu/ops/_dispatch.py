"""Runtime switch for the Pallas kernel paths.

The hot ops (GAE recurrence, categorical projection, engine substep) each
have two implementations: a fused-XLA default and a Pallas/Mosaic kernel.
Mosaic kernels HANG over the hosted axon TPU tunnel (CLAUDE.md), so the
default is ``off``; on a directly-attached TPU set
``--runner.pallas_kernels=on``.  ``interpret`` routes through the same
kernels via the Pallas interpreter — slow, but it makes the kernel path
load-bearing in CPU tests (tests/test_pallas_dispatch.py).

The mode is process-global and must be set before tracing (the dispatch
happens at trace time inside jitted training programs).
"""

_MODES = ("off", "on", "interpret")
_mode = "off"


def set_mode(mode):
    if isinstance(mode, bool):  # convenience: True == "on"
        mode = "on" if mode else "off"
    if mode not in _MODES:
        raise ValueError(f"pallas_kernels mode must be one of {_MODES}, got {mode!r}")
    global _mode
    _mode = mode


def mode():
    return _mode


def use_pallas():
    return _mode != "off"


def interpret():
    return _mode == "interpret"
