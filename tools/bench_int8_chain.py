"""Microbench: int8 conv CHAIN with static-scale quantize epilogues vs bf16.

Validates the full int8 inference design before building it (r4): with
static (calibrated) per-tensor activation scales the quantize step
(scale, round, clip, cast) is elementwise and should fuse into the
producer conv's epilogue, so a chain of N int8 convs should cost
~N x the single int8+epilogue conv time from tools/bench_int8.py.

Shapes: the stereo head (18x80x1408), the pyramid (18x80x1152), and
backbone stages (72x320x64 s4, 36x160x128 s8, 18x80x256 s16) incl. a
stride-2 downsample conv.

  python tools/bench_int8_chain.py
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tpu_time import device_ms

    rng = np.random.default_rng(0)
    dn = ('NHWC', 'HWIO', 'NHWC')

    def mk_bf16(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1,
                           jnp.bfloat16)

    def quant(x, s):
        return jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s)),
                        -127, 127).astype(jnp.int8)

    def chain_case(b, h, w, c, n_convs, stride1=1):
        ws_bf = [mk_bf16((3, 3, c, c)) for _ in range(n_convs)]
        ws_i8 = [jnp.asarray(rng.integers(-127, 128, (3, 3, c, c),
                                          dtype=np.int8))
                 for _ in range(n_convs)]
        wscale = jnp.asarray(rng.uniform(1e-3, 2e-3, (c,)).astype(np.float32))
        xs = [mk_bf16((b, h, w, c)) for _ in range(3)]

        @jax.jit
        def bf16_chain(x, ws):
            for wk in ws:
                x = jax.lax.conv_general_dilated(
                    x, wk, (stride1, stride1), 'SAME', dimension_numbers=dn)
                x = jax.nn.relu(x)
            return x

        @jax.jit
        def i8_chain(x, ws):
            for wk in ws:
                xq = quant(x, 0.05)
                acc = jax.lax.conv_general_dilated(
                    xq, wk, (stride1, stride1), 'SAME', dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                x = jax.nn.relu(acc.astype(jnp.float32) * (wscale * 0.05)
                                ).astype(jnp.bfloat16)
            return x

        ms_bf = device_ms(bf16_chain, [(x, ws_bf) for x in xs], iters=6)
        ms_i8 = device_ms(i8_chain, [(x, ws_i8) for x in xs], iters=6)
        print(f'[{b},{h},{w},{c}]x{n_convs} s{stride1}: '
              f'bf16 {ms_bf:7.3f} ms  int8 {ms_i8:7.3f} ms  '
              f'({ms_bf / ms_i8:.2f}x)', flush=True)

    chain_case(16, 18, 80, 1408, 3)    # stereo head reg branch
    chain_case(16, 18, 80, 1152, 2)    # pyramid tail
    chain_case(16, 72, 320, 64, 3)     # backbone stride-4
    chain_case(16, 36, 160, 128, 3)    # backbone stride-8
    chain_case(16, 18, 80, 256, 3)     # backbone stride-16
    chain_case(16, 72, 320, 64, 2, stride1=2)  # downsample-ish


if __name__ == '__main__':
    main()
