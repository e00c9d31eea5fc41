from ladder_tpu.utils.config import (
    apply_defaults,
    create_dirs,
    get_args,
    get_config_from_json,
    process_config,
    save_config,
)

__all__ = [
    "apply_defaults",
    "create_dirs",
    "get_args",
    "get_config_from_json",
    "process_config",
    "save_config",
]
