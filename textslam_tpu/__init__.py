"""textslam_tpu — a TPU-native (JAX/XLA/Pallas) re-design of TextSLAM.

Monocular keyframe SLAM with planar scene-text landmarks: ORB scene points
(inverse depth) tracked indirectly + text planes (θ) tracked by direct
photometric alignment, joint LM/Schur bundle adjustment, semantic text loop
closing. Built TPU-first: fixed-shape padded SoA state, batched kernels,
`lax` control flow, `shard_map` scale-out. Reference behavior spec:
SJTU-ViSYS/TextSLAM (see SURVEY.md).
"""

from .config import TextSLAMConfig, Experiment, load_yaml  # noqa: F401

__version__ = "0.1.0"
