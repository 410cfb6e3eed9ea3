"""Run modes, mirroring `rl_x/runner/runner_mode.py:1-4`."""


class RunnerMode:
    SHOW_CONFIG = "show_config"
    TRAIN = "train"
    TEST = "test"
