from rlx_tpu.runner.runner import Runner  # noqa: F401
from rlx_tpu.runner.runner_mode import RunnerMode  # noqa: F401
