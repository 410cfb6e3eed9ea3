"""Robot definition records for the locomotion env family.

Mirrors the reference's per-robot config dicts
(`rl_x/environments/custom_mujoco/robot_locomotion/robots/*`): each robot is
an MJCF authored for the rlx_tpu engine subset plus the metadata the env
needs (action scaling, joints that should stay near nominal, velocity
limits).
"""

import os

_HERE = os.path.dirname(os.path.abspath(__file__))

ROBOT_CONFIGS = {
    "quadruped": {
        "xml_path": os.path.join(_HERE, "quadruped.xml"),
        "scaling_factor": 0.45,
        # hip-roll (abduction) joints stay near nominal (reference:
        # `robots/unitree_go2` actuator_joints_to_stay_near_nominal)
        "actuator_joints_to_stay_near_nominal": [0, 3, 6, 9],
        "actuator_joint_max_velocities": [25.0] * 12,
        "control_frequency_hz": 50,
        # mean of characteristic robot dimensions; scales command velocity
        # and terrain roughness (reference hardcodes 0.5,
        # `robot_locomotion/mjx/environment.py:145`)
        "robot_dimensions_mean": 0.5,
    },
    "biped": {
        "xml_path": os.path.join(_HERE, "biped.xml"),
        "scaling_factor": 0.35,
        "actuator_joints_to_stay_near_nominal": [0, 5],  # hip-roll joints
        "actuator_joint_max_velocities": [20.0] * 10,
        "control_frequency_hz": 50,
        "robot_dimensions_mean": 0.7,
    },
}
