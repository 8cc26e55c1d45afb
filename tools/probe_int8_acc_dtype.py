"""Probe: can the 64-ch int8 conv avoid materializing its s32 accumulator?

r5 stereo profile: layer1's six 3x3 64-ch int8 convs emit raw
s32[32,72,320,64] to HBM (377 MB) and pay a separate kLoop requant fusion
that also relayouts — ~1.25 ms per conv pair where the memory floor is
~0.3 ms. The head's 1408-ch convs DO get kOutput epilogue fusion. This
probes whether preferred_element_type=f32/bf16 (convert inside the conv
epilogue) beats the s32-materialize + separate-scale form at the layer1
shape, chained over 6 convs like the real block stack.

  python tools/probe_int8_acc_dtype.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from tpu_time import device_ms


def main():
    import jax
    import jax.numpy as jnp

    B, H, W, C = 32, 72, 320, 64
    rng = np.random.default_rng(0)
    k_q = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)).astype(np.int8))
    scale = jnp.float32(1e-3)
    inv = jnp.float32(30.0)

    def conv(xq, preferred):
        return jax.lax.conv_general_dilated(
            xq, k_q, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=preferred)

    def chain(preferred):
        @jax.jit
        def f(xq):
            for _ in range(6):
                acc = conv(xq, preferred)
                y = acc.astype(jnp.float32) * scale
                y = jnp.maximum(y, 0.0)
                xq = jnp.clip(jnp.round(y * inv), -127, 127).astype(jnp.int8)
            return xq
        return f

    sets = [jnp.asarray(rng.integers(-127, 128, (B, H, W, C)).astype(np.int8))
            for _ in range(4)]
    for name, preferred in [('s32 acc (current)', jnp.int32),
                            ('f32 acc', jnp.float32),
                            ('bf16 acc', jnp.bfloat16)]:
        try:
            f = chain(preferred)
            jax.block_until_ready(f(sets[0]))
            ms = device_ms(f, [(s,) for s in sets], iters=8)
            print(f'{name:18s}: {ms:7.3f} ms / 6-conv chain '
                  f'({ms / 6:.3f} ms/conv)', flush=True)
        except Exception as e:  # noqa: BLE001 — probe records lowering failures
            print(f'{name:18s}: FAILED {type(e).__name__}: {str(e)[:120]}',
                  flush=True)

    # stem-shaped conv: [32,144,640,12] -> 64, 4x4 (the s2d stem conv is
    # 1.95 ms bf16 at 37 TF/s in the r5 profile; is the int8 emitter
    # better at cin=12, or is this the 0.79x-regression class?)
    Bs, Hs, Ws, Ci, Co = 32, 144, 640, 12, 64
    ks_f = rng.standard_normal((4, 4, Ci, Co)).astype(np.float32) * 0.05
    ks_q = jnp.asarray(np.clip(np.rint(ks_f / 5e-4), -127, 127).astype(np.int8))
    ks_b = jnp.asarray(ks_f, jnp.bfloat16)
    xs_f = [rng.standard_normal((Bs, Hs, Ws, Ci)).astype(np.float32)
            for _ in range(4)]
    xs_b = [jnp.asarray(x, jnp.bfloat16) for x in xs_f]
    xs_q = [jnp.asarray(np.clip(np.rint(x * 40), -127, 127).astype(np.int8))
            for x in xs_f]

    pad = [(2, 1), (2, 1)]

    @jax.jit
    def stem_bf16(x):
        y = jax.lax.conv_general_dilated(
            x, ks_b, (1, 1), pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.maximum(y, 0)

    @jax.jit
    def stem_int8(xq):
        acc = jax.lax.conv_general_dilated(
            xq, ks_q, (1, 1), pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        return jnp.maximum(acc.astype(jnp.float32) * 2e-5, 0).astype(jnp.bfloat16)

    for name, f, xs in [('stem conv bf16', stem_bf16, xs_b),
                        ('stem conv int8', stem_int8, xs_q)]:
        jax.block_until_ready(f(xs[0]))
        ms = device_ms(f, [(x,) for x in xs], iters=8)
        print(f'{name:18s}: {ms:7.3f} ms', flush=True)


if __name__ == '__main__':
    main()
