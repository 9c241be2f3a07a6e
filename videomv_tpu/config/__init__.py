from .config import AttrDict, Config, load_config, load_inference_config, merge_linked_config

__all__ = ["AttrDict", "Config", "load_config", "load_inference_config", "merge_linked_config"]
