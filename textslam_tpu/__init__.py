"""textslam_tpu — a TPU-native (JAX/XLA/Pallas) re-design of TextSLAM.

Monocular keyframe SLAM with planar scene-text landmarks: ORB scene points
(inverse depth) tracked indirectly + text planes (θ) tracked by direct
photometric alignment, joint LM/Schur bundle adjustment, semantic text loop
closing. Built TPU-first: fixed-shape padded SoA state, batched kernels,
`lax` control flow, `shard_map` scale-out. Reference behavior spec:
SJTU-ViSYS/TextSLAM (see SURVEY.md).
"""

import jax as _jax

# f32 matmul precision for the geometry/bookkeeping kernels. On TPU the
# default bf16 matmul passes pixel-scale values (uv coords ~100..600) through
# einsums in two-view RANSAC / triangulation / projection chains, quantizing
# them to ~2 px and measurably degrading ATE (scene-only rendered sequence:
# 0.052 on TPU-bf16 vs 0.002 at f32 — bisected round 2). The compute-heavy
# paths make their own explicit precision choices regardless: solver
# contractions pin HIGHEST internally (solver/ba.py), the photometric
# sampling Pallas kernel pins single-pass bf16 (ops/pallas_kernels.py).
_jax.config.update("jax_default_matmul_precision", "highest")

from .config import TextSLAMConfig, Experiment, load_yaml  # noqa: F401

__version__ = "0.1.0"
