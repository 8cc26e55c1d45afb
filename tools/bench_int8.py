"""Microbench: int8 MXU throughput vs bf16 at the stereo head conv shape.

v5e datasheet: 197 TFLOP/s bf16, 394 TOPS int8. The r3 roofline closed
bf16 at ~335 fps because head+pyramid 3x3 convs (1408/1152 ch at 18x80)
are 21 ms of the 51.7 and already run at ~94% of bf16 peak
(tools/bench_head_conv.py). If this toolchain lowers int8 convs /
int8 matmuls onto the MXU at ~2x bf16, quantizing the head is the only
route from 309 to the 500-fps north-star (VERDICT r3 #1).

Measures, at [16,18,80,1408] -> 1408 (3x3 SAME):
  - bf16 conv (the current path, ~186 TF/s reference point)
  - int8 conv  via lax.conv_general_dilated(preferred_element_type=int32)
  - int8 matmul [23040,1408]x[1408,1408] preferred int32
  - mixed int8 x bf16 (if supported)
Prints ms + effective TFLOP/TOPS so the 2x question is answered directly.

  python tools/bench_int8.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu_time import device_ms

    b, h, w, c = 16, 18, 80, 1408
    cout = 1408
    rng = np.random.default_rng(0)

    x_bf = [jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32),
                        jnp.bfloat16) for _ in range(3)]
    x_i8 = [jnp.asarray(rng.integers(-127, 128, (b, h, w, c), dtype=np.int8))
            for _ in range(3)]
    w_bf = jnp.asarray(rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.02,
                       jnp.bfloat16)
    w_i8 = jnp.asarray(rng.integers(-127, 128, (3, 3, c, cout), dtype=np.int8))
    xm_i8 = [jnp.asarray(rng.integers(-127, 128, (b * h * w, c), dtype=np.int8))
             for _ in range(3)]
    wm_i8 = jnp.asarray(rng.integers(-127, 128, (c, cout), dtype=np.int8))

    dn = ('NHWC', 'HWIO', 'NHWC')
    flops_conv = 2 * b * h * w * 9 * c * cout
    flops_mm = 2 * b * h * w * c * cout

    @jax.jit
    def conv_bf16(x):
        return jax.lax.conv_general_dilated(x, w_bf, (1, 1), 'SAME',
                                            dimension_numbers=dn)

    @jax.jit
    def conv_i8(x):
        return jax.lax.conv_general_dilated(
            x, w_i8, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    @jax.jit
    def conv_i8_f32out(x):
        # int8 conv with f32 epilogue (scale+cast) as the real path would do
        acc = jax.lax.conv_general_dilated(
            x, w_i8, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * 1.7e-4).astype(jnp.bfloat16)

    @jax.jit
    def mm_i8(x):
        return jax.lax.dot_general(x, wm_i8, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    cases = [
        ('conv3x3 bf16      ', conv_bf16, x_bf, flops_conv),
        ('conv3x3 int8->i32 ', conv_i8, x_i8, flops_conv),
        ('conv3x3 int8+epi  ', conv_i8_f32out, x_i8, flops_conv),
        ('matmul  int8->i32 ', mm_i8, xm_i8, flops_mm),
    ]
    for name, fn, xs, flops in cases:
        try:
            argsets = [(s,) for s in xs]
            ms = device_ms(fn, argsets, iters=6)
            tops = flops / (ms * 1e-3) / 1e12
            print(f'{name}: {ms:7.3f} ms  {tops:6.1f} T(FL)OP/s', flush=True)
        except Exception as e:  # noqa: BLE001 - probe tool, report and go on
            print(f'{name}: FAILED {type(e).__name__}: {str(e)[:300]}',
                  flush=True)


if __name__ == '__main__':
    main()
