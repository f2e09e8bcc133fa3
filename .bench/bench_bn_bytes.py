"""Cost-analysis bytes/flops of the flagship train step at several BN stride
combos — checks whether the HBM-lean BN actually shrinks the program's HBM
traffic (timing says it doesn't; find out why)."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

B = 128
hw = (256, 256)
rng = np.random.default_rng(0)
batch = {
    "images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
    "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
    "mask": jnp.ones((B,), jnp.float32),
}

for ss, gs in [(1, 1), (4, 4), (8, 8)]:
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2, backbone="resnet50", resnet_output_dim=1024,
            bn_stats_stride=ss, bn_grad_stride=gs,
        ),
        use_augmentation=True, amp=True, wandb_log=False,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
    step = make_train_step(model, cfg, base_seed=0)
    ca = step.lower(state, batch).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(
        f"ss={ss} gs={gs}: bytes={ca.get('bytes accessed', 0)/1e9:.1f} GB  "
        f"flops={ca.get('flops', 0)/1e12:.2f} TF",
        flush=True,
    )
