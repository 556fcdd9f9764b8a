from .mapper import (MapState, close_loop, detect_loop_closures, init_map,
                     map_insert, retire_features)
from .p3p import p3p_grunert, pnp_ransac

__all__ = ["MapState", "close_loop", "detect_loop_closures", "init_map",
           "map_insert", "retire_features", "p3p_grunert", "pnp_ransac"]
