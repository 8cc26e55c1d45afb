"""Validate + time the interleaved-eye corr kernel vs split+corr on TPU.

  python tools/bench_corr_interleaved.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION', 'python')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tools.tpu_time import device_ms
    from visualdet3d_tpu.ops.cost_volume import (
        correlation_volume_pallas,
        correlation_volume_pallas_interleaved,
        correlation_volume_xla,
    )

    rng = np.random.default_rng(0)
    B = jax.lax.optimization_barrier

    for (b, h, w, c, d) in [(16, 72, 320, 64, 24), (16, 36, 160, 128, 24)]:
        both_np = rng.standard_normal((2 * b, h, w, c)).astype(np.float32)
        both = jnp.asarray(both_np, jnp.bfloat16)

        # correctness vs XLA reference on the split eyes
        ref = correlation_volume_xla(both[0::2], both[1::2], d)
        out = jax.jit(lambda x: correlation_volume_pallas_interleaved(x, d))(both)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - out.astype(jnp.float32))))
        print(f'[{b},{h},{w},{c}] d={d} max_err={err:.5f}', flush=True)
        assert err < 0.05, err

        # timing: split (barrier'd reshape, as the model does) + pallas
        def split_path(x):
            y = B(x.reshape(b, 2, h, w, c))
            return correlation_volume_pallas(y[:, 0], y[:, 1], d)

        def inter_path(x):
            return correlation_volume_pallas_interleaved(x, d)

        args = [(jnp.asarray(rng.standard_normal((2 * b, h, w, c)),
                             jnp.bfloat16),) for _ in range(3)]
        ms_split = device_ms(jax.jit(split_path), args)
        ms_inter = device_ms(jax.jit(inter_path), args)
        print(f'  split+corr {ms_split:6.3f} ms   interleaved {ms_inter:6.3f} ms',
              flush=True)


if __name__ == '__main__':
    main()
