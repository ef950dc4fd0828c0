from .loader import ConfigNode, compose, default_config_dir, to_container
from .instantiate import instantiate, locate

__all__ = ["ConfigNode", "compose", "default_config_dir", "to_container",
           "instantiate", "locate"]
