from . import layout
from .config import VIOConfig, config_from_json, load_json_with_comments
from .state import VIOState, init_state
from .pipeline import vio_frame, update_step

__all__ = ["layout", "VIOConfig", "config_from_json",
           "load_json_with_comments", "VIOState", "init_state", "vio_frame",
           "update_step"]
