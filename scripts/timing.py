"""Single-frame inference latency benchmark (the reference's scripts/timing.py,
un-staled: its version passed W=/H= kwargs the model config no longer accepts,
scripts/timing.py:20).

Measures the compiled images -> se(3) forward at (B, 256, 256, 6) over N trials and
reports mean/p50/p95. Run on the TPU: `python scripts/timing.py --batch-size 1`.
"""

import os
import sys
import time
from dataclasses import dataclass

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@dataclass
class TimingConfig:
    n_trials: int = 100
    batch_size: int = 2  # the reference's protocol uses batch 2 (scripts/timing.py:40)
    n_cams: int = 2
    height: int = 256
    width: int = 256
    backbone: str = "resnet50"
    dtype: str = "bfloat16"


def main(cfg: TimingConfig) -> None:
    import jax
    import jax.numpy as jnp

    from argus_tpu.models import NCameraCNN, NCameraCNNConfig
    from argus_tpu.utils import time_jax_fn

    model_cfg = NCameraCNNConfig(
        n_cams=cfg.n_cams, resnet_output_dim=1024, backbone=cfg.backbone, dtype=cfg.dtype
    )
    model = NCameraCNN(model_cfg)
    x = jnp.zeros((cfg.batch_size, cfg.height, cfg.width, 3 * cfg.n_cams), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x, train=False)))

    t0 = time.perf_counter()
    float(fwd(variables, x))
    print(f"Compilation took {time.perf_counter() - t0:.2f} seconds.")

    rng = np.random.default_rng(0)
    times = []
    for _ in range(cfg.n_trials):
        xi = jnp.asarray(rng.random((cfg.batch_size, cfg.height, cfg.width, 3 * cfg.n_cams), np.float32))
        t0 = time.perf_counter()
        float(fwd(variables, xi))
        times.append(time.perf_counter() - t0)
    times_ms = np.asarray(times) * 1e3
    print(
        f"Forward pass over {cfg.n_trials} trials (batch {cfg.batch_size}): "
        f"mean {times_ms.mean():.3f} ms | p50 {np.percentile(times_ms, 50):.3f} ms | "
        f"p95 {np.percentile(times_ms, 95):.3f} ms"
    )


if __name__ == "__main__":
    from argus_tpu.configs import cli

    main(cli(TimingConfig))
