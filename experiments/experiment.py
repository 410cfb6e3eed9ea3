"""Entry point, mirroring `experiments/experiment.py:1-6` of the reference.

Usage:
  python experiment.py --algorithm.name=ppo.tpu --environment.name=classic.pendulum.tpu \
      --runner.mode=train --algorithm.total_timesteps=100000 --runner.track_console=True
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlx_tpu.runner import Runner  # noqa: E402


def main():
    runner = Runner()
    runner.run()


if __name__ == "__main__":
    main()
