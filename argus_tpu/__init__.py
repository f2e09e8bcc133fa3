"""argus_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the Argus cube-pose-estimation framework.

Capability parity target: pculbertson/argus (see SURVEY.md). The compute path is pure
JAX (jit/pjit/shard_map + Pallas kernels); host-side subsystems (dataset IO, Unity
bridge, MuJoCo re-render validation) mirror the reference's behavior with the quirks
fixed (SURVEY.md section "Known reference quirks").

Layout (reference: flat `argus/` package, see SURVEY.md §1):
    geom        SE(3)/se(3)/quaternion math (replaces pypose + argus/utils.py converters)
    ops         on-device image preprocessing + augmentation kernels (replaces kornia)
    models      flax ResNet backbones + NCameraCNN pose regressor (replaces argus/models.py)
    data        HDF5+PNG dataset, host feed, synthetic fixture generator (replaces argus/data.py)
    parallel    mesh construction + sharding rules (replaces torch DDP/NCCL, argus/train.py:132-199)
    train       jitted train step, DP training loop (replaces argus/train.py)
    checkpoint  single msgpack checkpoint format for 1..N chips (fixes DDP `module.` prefix quirk)
    validate    sim-set validation visuals (replaces argus/validate.py)
    validate_real  MuJoCo re-render real validation (replaces argus/validate_real.py)
    datagen     Unity/MJPC data generation bridge (replaces argus/data_generation.py)
"""

import os

# Repo-root anchor used by every config __post_init__ for "path relative to package
# root" resolution (reference: argus/__init__.py:1-4).
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

__version__ = "0.1.0"

__all__ = ["ROOT", "__version__"]
