"""Microbench: the stereo head's 1408-channel 3x3 convs at 18x80.

Quantifies the gap between the XLA conv emitter (~50% MXU at this shape per
the r3 profile) and a plain big matmul of the same FLOPs — i.e. the
headroom a fused Pallas conv kernel could reclaim.

  python tools/bench_head_conv.py
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
    sets = [jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32),
                        jnp.bfloat16) for _ in range(3)]
    wconv = jnp.asarray(rng.standard_normal((3, 3, c, cout)).astype(np.float32) * 0.02,
                        jnp.bfloat16)
    wmm = jnp.asarray(rng.standard_normal((9 * c, cout)).astype(np.float32) * 0.02,
                      jnp.bfloat16)

    @jax.jit
    def conv(x, w_):
        return jax.lax.conv_general_dilated(
            x, w_, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    @jax.jit
    def matmul(x, w_):
        return x.reshape(b * h * w, c).repeat(1, axis=0).reshape(
            b * h * w, c) @ w_[:c]

    @jax.jit
    def matmul9(x, w_):
        # same FLOPs as the 3x3 conv: [BHW, 9C] @ [9C, Cout], with the 9C
        # input faked by tiling (measures pure MXU throughput, not im2col)
        xx = jnp.concatenate([x.reshape(b * h * w, c)] * 9, axis=1)
        return xx @ w_

    @jax.jit
    def tap9(x, w_):
        # 9 shifted 1x1 matmuls accumulated (roll + dot), SAME-pad semantics
        # ignored at edges — perf probe only
        acc = None
        xf = x
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xs = jnp.roll(jnp.roll(xf, dy, axis=1), dx, axis=2)
                y = xs.reshape(b * h * w, c) @ w_[k * c:(k + 1) * c]
                acc = y if acc is None else acc + y
                k += 1
        return acc

    for name, fn, args in [
            ('conv3x3 ', conv, (None, wconv)),
            ('matmul1 ', matmul, (None, wmm)),
            ('matmul9 ', matmul9, (None, wmm)),
            ('tap9    ', tap9, (None, wmm))]:
        argsets = [(s, args[1]) for s in sets]
        ms = device_ms(fn, argsets, iters=6)
        print(f'{name}: {ms:7.3f} ms/call', flush=True)


if __name__ == '__main__':
    main()
