from . import brief, fast, image, lk
from .tracker import (FrontendState, init_frontend, tracker_image,
                      tracker_only_frame, vio_frame_image)

__all__ = ["brief", "fast", "image", "lk", "FrontendState", "init_frontend",
           "tracker_image", "tracker_only_frame", "vio_frame_image"]
