from .imu_sim import IMUSim, get_imu_sim
from .pcw import PointCloudWorld, RandomPCW, Checkerboard

__all__ = ["IMUSim", "get_imu_sim", "PointCloudWorld", "RandomPCW",
           "Checkerboard"]
