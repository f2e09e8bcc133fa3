"""Round-3 whole-backbone fusion sweep on the real chip.

Each arg is a comma-separated k=v spec; keys:
  blk  = identity-block fusion stages ('-' off, 'all' = 0123, or digits '01')
  proj = 1 to fuse projection/strided stage-entry blocks too (same stage list)
  B    = global batch (default 128)
  bn   = frozen (default; full FrozenBatchNorm2d)

Examples:
  python .bench/bench_fuse3.py blk=-        # unfused baseline (cache-warm)
  python .bench/bench_fuse3.py blk=all,proj=1   # whole backbone minus stem
  python .bench/bench_fuse3.py blk=01 blk=all blk=all,proj=1
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

hw = (256, 256)


def parse(arg):
    d = dict(blk="-", proj="0", stem="0", stage="0", B="128", bn="frozen")
    for kv in arg.split(","):
        k, v = kv.split("=")
        d[k] = v
    return d


specs = [parse(a) for a in sys.argv[1:]] or [parse("blk=-"), parse("blk=all,proj=1")]

for d in specs:
    blk = d["blk"]
    stages = tuple(range(4)) if blk == "all" else tuple(int(c) for c in blk if c.isdigit())
    fuse_on = blk != "-"
    B = int(d["B"])
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2, backbone="resnet50", resnet_output_dim=1024,
            bn_frozen=True, bn_frozen_affine=True,
            fuse_block="on" if fuse_on else "off",
            fuse_block_stages=stages if fuse_on else (0, 1),
            fuse_proj="on" if d["proj"] == "1" else "off",
            fuse_stem="on" if d["stem"] == "1" else "off",
            # stage=0 off, stage=1 on (default stages), stage=NNN... on with
            # those stage indices chained (e.g. stage=012)
            fuse_stage="off" if d["stage"] == "0" else "on",
            fuse_stage_stages=(
                tuple(int(c) for c in d["stage"])
                if d["stage"] not in ("0", "1")
                else (0,)
            ),
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
        f"blk={blk} proj={d['proj']} stem={d['stem']} stage={d['stage']} B={B}: {dt*1e3:.1f} ms/step  "
        f"{2*B/dt:.0f} cam-img/s  loss={final:.5f}  (compile {compile_s:.0f}s)",
        flush=True,
    )
