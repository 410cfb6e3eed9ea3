from ml_collections import config_dict


def get_config(environment_name):
    config = config_dict.ConfigDict()

    config.name = environment_name

    config.seed = 1
    config.nr_envs = 8
    config.horizon = 200
    config.render = False
    # POMDP variant: hide the angular velocity (memory-suite validation)
    config.mask_velocity = False

    return config
