"""Isolate BN-stats reduce patterns on the chip: is a strided/subsampled reduce
actually cheaper than the full reduce, and which subsample layout is fastest?"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")

N, H, W, C = 256, 64, 64, 256  # representative mid-stage activation, bf16
x = jnp.asarray(np.random.default_rng(0).normal(size=(N, H, W, C)), jnp.bfloat16)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / reps
    gb = N * H * W * C * 2 / 1e9
    print(f"{name:28s} {dt*1e6:8.0f} us   ({gb/dt:6.0f} GB/s vs full-tensor bytes)", flush=True)
    return dt


def stats(xs):
    xs32 = xs.astype(jnp.float32)
    red = (0, 1, 2)
    return jnp.mean(xs32, red), jnp.mean(jnp.square(xs32), red)


timeit("full reduce", jax.jit(lambda x: stats(x)), x)
timeit("H-strided ::4", jax.jit(lambda x: stats(x[:, ::4])), x)
timeit("H-contig :H//4", jax.jit(lambda x: stats(x[:, : H // 4])), x)
timeit("N-strided ::4", jax.jit(lambda x: stats(x[::4])), x)
timeit("N-contig :N//4", jax.jit(lambda x: stats(x[: N // 4])), x)
timeit("W-strided ::4", jax.jit(lambda x: stats(x[:, :, ::4])), x)

# the backward pattern: reduce over TWO tensors (x, dy) with elementwise combine
dy = jnp.asarray(np.random.default_rng(1).normal(size=(N, H, W, C)), jnp.bfloat16)
mean = jnp.zeros((C,), jnp.float32)
rstd = jnp.ones((C,), jnp.float32)


def bwd_reduce(x, dy, sl):
    xs, dys = x[sl], dy[sl]
    d32 = dys.astype(jnp.float32)
    xh = (xs.astype(jnp.float32) - mean) * rstd
    return jnp.sum(d32, (0, 1, 2)), jnp.sum(d32 * xh, (0, 1, 2))


timeit("bwd full", jax.jit(lambda x, dy: bwd_reduce(x, dy, np.s_[:])), x, dy)
timeit("bwd H ::4", jax.jit(lambda x, dy: bwd_reduce(x, dy, np.s_[:, ::4])), x, dy)
timeit("bwd N-contig :N//4", jax.jit(lambda x, dy: bwd_reduce(x, dy, np.s_[: N // 4])), x, dy)
timeit("bwd N-strided ::4", jax.jit(lambda x, dy: bwd_reduce(x, dy, np.s_[::4])), x, dy)
