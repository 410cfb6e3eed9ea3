"""FastMPO: MPO with the FastTD3 recipe.

Parity with `rl_x/algorithms/fastmpo/flax_full_jit/fastmpo.py`
(`default_config.py:52-58`): the MPO E/M machinery with a tight value
support [-10, 10], n-step returns, running observation normalization, and
locomotion-scale networks.  Implementation shares rlx_tpu's MPO class; the
recipe lives in the config defaults.
"""

from rlx_tpu.algorithms.fastmpo.tpu.general_properties import GeneralProperties
from rlx_tpu.algorithms.mpo.tpu.mpo import MPO


class FastMPO(MPO):
    def general_properties():
        return GeneralProperties
