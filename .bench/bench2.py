import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from argus_tpu.models import NCameraCNN, NCameraCNNConfig

B=128; hw=(256,256)
rng=np.random.default_rng(0)
x = jnp.asarray(rng.random((B,*hw,6),dtype=np.float32))
cfg = NCameraCNNConfig(n_cams=2, backbone="resnet50", resnet_output_dim=1024, dtype="bfloat16")
model = NCameraCNN(cfg)
v = model.init(jax.random.PRNGKey(0), x[:1], train=False)
print("init done", flush=True)
fwd = jax.jit(lambda v,x: jnp.sum(model.apply(v,x,train=False)))
t0=time.perf_counter(); float(fwd(v,x)); print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
float(fwd(v,x))
n=10; t0=time.perf_counter()
for _ in range(n): out=fwd(v,x)
float(out)
t=(time.perf_counter()-t0)/n
gf = 2*B*5.36
print(f"bf16 eval fwd: {t*1e3:.1f} ms -> {gf/t/1e3:.1f} TFLOP/s, {2*B/t:.0f} img/s", flush=True)
