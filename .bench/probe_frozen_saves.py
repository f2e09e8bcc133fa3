"""Does the frozen-stage path run save-residual or no-save fused forwards?

Builds the flagship train step (fuse all on, interpret mode, CPU) with
frozen_stages=3 and walks the jaxpr counting pallas_call equations by output
arity. A save-forward stage chain has 1 + (nblocks-1) + 2*nblocks outputs; the
no-save forward has exactly 1. If save-forwards appear for frozen stages, their
residual HBM writes survive DCE (multi-output custom calls are all-or-nothing)
and stop_gradient'ing the frozen WEIGHTS is worth real milliseconds.
"""
import os, sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

B, hw = 2, (64, 64)
cfg = TrainConfig(
    model_config=NCameraCNNConfig(
        n_cams=2, backbone="resnet50", resnet_output_dim=64,
        bn_frozen=True, bn_frozen_affine=True,
        stem_frozen=os.environ.get("PROBE_STEM", "frozen") == "frozen",
        frozen_stages=int(os.environ.get("PROBE_FROZEN_STAGES", "3")),
        fuse_block="on", fuse_proj="on", fuse_stem="on", fuse_stage="on",
    ),
    use_augmentation=False, amp=False, wandb_log=False,
)
model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
step = make_train_step(model, cfg, base_seed=0)
rng = np.random.default_rng(0)
batch = {
    "images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
    "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
    "mask": jnp.ones((B,), jnp.float32),
}

jaxpr = jax.make_jaxpr(step)(state, batch)


def walk(jx, out):
    for eqn in jx.eqns:
        if eqn.primitive.name == "pallas_call":
            name = eqn.params.get("name_and_src_info")
            out.append((str(name).split(" ")[0], len(eqn.outvars),
                        [tuple(v.aval.shape) for v in eqn.outvars[:3]]))
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                walk(v.jaxpr, out)
            elif isinstance(v, (tuple, list)):
                for w in v:
                    if hasattr(w, "jaxpr"):
                        walk(w.jaxpr, out)
    return out


calls = walk(jaxpr.jaxpr, [])
print(f"{len(calls)} pallas_call eqns:")
for name, nout, shapes in calls:
    kind = "NO-SAVE" if nout == 1 else f"SAVE({nout} outs)"
    print(f"  {name:30s} {kind:14s} first-outs={shapes}")
