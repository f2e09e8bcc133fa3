"""Device mesh construction + sharding rules (the torch DDP/NCCL replacement).

Reference equivalents (SURVEY.md §2.3):
  * `dist.init_process_group("nccl", ...)` (argus/train.py:137-140) -> `init_distributed`
  * DDP gradient all-reduce (argus/train.py:199)  -> XLA-inserted psum over the
    `data` mesh axis (jit + NamedSharding; collectives ride ICI)
  * DistributedSampler (argus/train.py:154-166)   -> HostDataLoader sharding +
    `global_batch` assembly here
"""

from argus_tpu.parallel.mesh import (
    batch_sharding,
    device_prefetch,
    global_batch,
    init_distributed,
    make_mesh,
    param_shardings,
    replicated,
)

__all__ = [
    "batch_sharding",
    "device_prefetch",
    "global_batch",
    "init_distributed",
    "make_mesh",
    "param_shardings",
    "replicated",
]
