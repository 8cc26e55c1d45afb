"""Compare correlation-volume implementations on the TPU."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def timeit(fn, *args, iters=30):
    import jax
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000

def main():
    import jax, jax.numpy as jnp
    from visualdet3d_tpu.ops.cost_volume import (correlation_volume_pallas,
                                                 correlation_volume_xla)
    rng = np.random.default_rng(0)
    results = {}
    for tag, (b, h, w, c, d) in {
            's4': (16, 72, 320, 64, 24), 's8': (16, 36, 160, 128, 24)}.items():
        for dt in ('float32', 'bfloat16'):
            l = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32)).astype(dt)
            r = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32)).astype(dt)
            results[f'pallas_{tag}_{dt}'] = round(timeit(
                jax.jit(lambda a, b_: correlation_volume_pallas(a, b_, d)), l, r), 2)
            results[f'xla_{tag}_{dt}'] = round(timeit(
                jax.jit(lambda a, b_: correlation_volume_xla(a, b_, d)), l, r), 2)
    print(json.dumps(results))

if __name__ == '__main__':
    main()
