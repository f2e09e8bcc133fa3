"""A/B the flagship train step across (bn_mode, stem_s2d, batch[, remat]) combos
on the real chip. bn_mode semantics match bench.py's BENCH_BN: "frozen" = full
FrozenBatchNorm2d (affine frozen too), "frozentrain" = frozen stats + trainable
affine, "exact" = train-mode batch statistics; "frozendot" = frozen + 1x1-as-dot.
remat: '-'=off, 'all', or digits = stage indices (e.g. '01').
Usage: python .bench/bench_flagship.py frozen,0,128 frozen,0,128,01 ..."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

hw = (256, 256)
combos = []
for a in sys.argv[1:]:
    parts = a.split(",")
    m, s2d, b = parts[0], parts[1], parts[2]
    rm = parts[3] if len(parts) > 3 else "-"
    combos.append((m, bool(int(s2d)), int(b), rm))
if not combos:
    combos = [("frozen", False, 128, "-"), ("frozen", True, 128, "-"), ("frozen", False, 192, "-")]

for mode, s2d, B, rm in combos:
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2, backbone="resnet50", resnet_output_dim=1024,
            bn_frozen=mode.startswith("frozen"),
            bn_frozen_affine=mode in ("frozen", "frozenaff", "frozendot", "frozenblk"),
            fuse_pointwise="dot" if mode == "frozendot" else "off",
            fuse_block="on" if mode == "frozenblk" else "off",
            stem_space_to_depth=s2d,
            remat=(rm == "all"),
            remat_stages=tuple(int(c) for c in rm) if rm not in ("-", "all") else (),
        ),
        use_augmentation=True, amp=True, wandb_log=False,
    )
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
        "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
        "mask": jnp.ones((B,), jnp.float32),
    }
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
        f"bn={mode} s2d={int(s2d)} B={B} remat={rm}: {dt*1e3:.1f} ms/step  "
        f"{2*B/dt:.0f} cam-img/s  loss={final:.5f}  (compile {compile_s:.0f}s)",
        flush=True,
    )
