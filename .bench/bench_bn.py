"""A/B the HBM-lean BatchNorm strides on the real chip: full flagship train step
(resnet50, bf16, B=128, 256x256, full augmentation) at several (stats_stride,
grad_stride) combos. Usage: python .bench/bench_bn.py [combos like 1,1 4,1 4,4]"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

B = 128
hw = (256, 256)
def _parse(a):
    parts = a.split(",")
    return int(parts[0]), int(parts[1]), (parts[2] if len(parts) > 2 else "xla")


combos = [_parse(a) for a in sys.argv[1:]] or [(1, 1, "xla"), (4, 4, "xla"), (4, 4, "pallas")]

rng = np.random.default_rng(0)
batch = {
    "images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
    "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
    "mask": jnp.ones((B,), jnp.float32),
}

for ss, gs, impl in combos:
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2, backbone="resnet50", resnet_output_dim=1024,
            bn_stats_stride=ss, bn_grad_stride=gs, bn_impl=impl,
        ),
        use_augmentation=True, amp=True, wandb_log=False,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
    step = make_train_step(model, cfg, base_seed=0)
    t0 = time.perf_counter()
    state, loss = step(state, batch)
    float(loss)
    compile_s = time.perf_counter() - t0
    state, loss = step(state, batch)
    float(loss)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, batch)
    final = float(loss)
    dt = (time.perf_counter() - t0) / n
    print(
        f"ss={ss} gs={gs} impl={impl}: {dt*1e3:.1f} ms/step  {2*B/dt:.0f} cam-img/s  "
        f"loss={final:.4f}  (compile {compile_s:.0f}s)",
        flush=True,
    )
