"""Floor experiment: the flagship train step with BatchNorm in EVAL mode inside the
loss (frozen running stats, no batch statistics, no BN-backward reductions) —
the hard lower bound on what any BN-reduction optimization could buy. Gradients
still flow through scale/bias and all convs."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models import NCameraCNN, NCameraCNNConfig
from argus_tpu.ops.augment import AugmentationConfig, apply_augmentation
from argus_tpu.train import TrainConfig, create_train_state, geometric_loss_fn

B = 128
hw = (256, 256)
cfg = TrainConfig(
    model_config=NCameraCNNConfig(n_cams=2, backbone="resnet50", resnet_output_dim=1024),
    use_augmentation=True, amp=True, wandb_log=False,
)
model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
tx = optax.chain(optax.clip_by_global_norm(1.0), optax.scale_by_adam())
opt_state = tx.init(state.params)
acfg = AugmentationConfig()

@jax.jit
def step(params, opt_state, batch_stats, batch):
    imgs = batch["images"].astype(jnp.bfloat16) / 255.0
    imgs = apply_augmentation(acfg, jax.random.PRNGKey(0), imgs, n_cams=2)

    def loss_fn(p):
        pred = model.apply({"params": p, "batch_stats": batch_stats}, imgs, train=False)
        losses = geometric_loss_fn(pred, batch["cube_pose"])
        return jnp.mean(losses)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, jax.tree.map(lambda u: -1e-4 * u, updates))
    return params, opt_state, loss

rng = np.random.default_rng(0)
batch = {
    "images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
    "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
}

ca = step.lower(state.params, opt_state, state.batch_stats, batch).compile().cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print(f"bytes={ca.get('bytes accessed',0)/1e9:.1f} GB flops={ca.get('flops',0)/1e12:.2f} TF", flush=True)

params, os_, bs_ = state.params, opt_state, state.batch_stats
t0 = time.perf_counter()
params, os_, loss = step(params, os_, bs_, batch)
float(loss)
print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
params, os_, loss = step(params, os_, bs_, batch)
float(loss)
n = 20
t0 = time.perf_counter()
for _ in range(n):
    params, os_, loss = step(params, os_, bs_, batch)
float(loss)
dt = (time.perf_counter() - t0) / n
print(f"eval-BN train step: {dt*1e3:.1f} ms/step  {2*B/dt:.0f} cam-img/s", flush=True)
