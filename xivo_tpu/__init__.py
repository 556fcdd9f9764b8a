"""xivo_tpu — a TPU-native visual-inertial odometry + sparse mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ucla-vision/xivo: EKF-based VIO with online self-calibration, depth
subfilters, MSCKF-style out-of-state updates, loop closure, and a
bundle-adjustment backend — built as pure functions over statically-shaped
masked state tables so the whole filter jits into a single XLA program,
vmaps over sequences, and shards over TPU meshes.
"""

__version__ = "0.1.0"
