"""SLAM agents: Mapper (scene optimization), Tracker (pose optimization),
keyframe store, and the orchestrating System."""

from attentive_dfprior_tpu.slam.system import SLAMSystem  # noqa: F401
