"""Calibrate achievable HBM bandwidth / VPU FLOPs with chained iterations
(data dependencies defeat any result caching in the tunnel)."""
import time

import jax
import jax.numpy as jnp


def timed_chain(fn, x, n=10):
    x = jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n


N = 64 * 1024 * 1024  # 256 MB f32
x = jnp.ones((N,), jnp.float32)

t = timed_chain(jax.jit(lambda x: x * 1.000001 + 1e-9), x)
print(f"copy-scale 256MB r+w: {t*1e3:.2f} ms -> {2*N*4/t/1e9:.0f} GB/s")

t = timed_chain(jax.jit(lambda x: jnp.exp(x * 1e-9) - 0.5), x)
print(f"exp 256MB: {t*1e3:.2f} ms -> {N/t/1e9:.1f} Gexp/s")

x2 = jnp.ones((8192, 8192), jnp.float32)
t = timed_chain(jax.jit(lambda a: a.T + 1e-9), x2)
print(f"transpose 256MB: {t*1e3:.2f} ms -> {2*x2.size*4/t/1e9:.0f} GB/s")

a = jnp.full((4096, 4096), 1e-3, jnp.bfloat16)
t = timed_chain(jax.jit(lambda a: (a @ a) * 1e-3), a)
print(f"matmul 4096^3 bf16: {t*1e3:.2f} ms -> "
      f"{2*4096**3/t/1e12:.1f} TFLOP/s")

y = jnp.ones((4 * 1024 * 1024,), jnp.float32)


@jax.jit
def vpu(y):
    for _ in range(64):
        y = y * 1.0000001 + 1e-12
    return y


t = timed_chain(vpu, y)
print(f"vpu fma x64 on 16MB: {t*1e3:.2f} ms -> "
      f"{64*2*y.size/t/1e12:.2f} TFLOP/s")
