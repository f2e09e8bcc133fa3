"""Sanity script: overfit a small model to random SE(3) targets with the geodesic
loss (the reference's scripts/rotation_overfitting.py, in JAX).

Two modes mirroring the reference:
  * `--mode mlp`    — MLP from 3-d inputs to se(3) (reference train_MLP)
  * `--mode resnet` — ResNet-18 from random 32x32 images (reference train_resnet)

If the loss does not collapse toward 0, the geodesic loss/SE(3) Exp chain is broken.
"""

import os
import sys
from dataclasses import dataclass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@dataclass
class OverfitConfig:
    mode: str = "mlp"  # "mlp" | "resnet"
    num_examples: int = 100
    n_iters: int = 2000
    lr: float = 1e-3
    print_every: int = 100
    seed: int = 0


def main(cfg: OverfitConfig) -> float:
    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn

    from argus_tpu import geom
    from argus_tpu.train import geometric_loss_fn

    key = jax.random.PRNGKey(cfg.seed)
    k_data, k_target, k_init = jax.random.split(key, 3)
    targets = geom.random_SE3(k_target, (cfg.num_examples,))

    if cfg.mode == "mlp":

        class MLP(nn.Module):
            @nn.compact
            def __call__(self, x):
                for _ in range(4):
                    x = nn.relu(nn.Dense(256)(x))
                return nn.Dense(6)(x)

        model = MLP()
        x = jax.random.uniform(k_data, (cfg.num_examples, 3))
    elif cfg.mode == "resnet":
        from argus_tpu.models.resnet import resnet18

        model = resnet18(output_dim=6)
        x = jax.random.uniform(k_data, (cfg.num_examples, 32, 32, 3))
    else:
        raise ValueError(f"unknown mode {cfg.mode}")

    variables = model.init(k_init, x[:1])
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p, **extra}, x)
            return jnp.mean(geometric_loss_fn(out, targets))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for i in range(cfg.n_iters):
        params, opt_state, loss = step(params, opt_state)
        if i % cfg.print_every == 0:
            print(f"Iteration {i}, Loss: {float(loss):.6f}")
    print(f"Final loss: {float(loss):.6f}")
    return float(loss)


if __name__ == "__main__":
    from argus_tpu.configs import cli

    main(cli(OverfitConfig))
