"""Microbench: eye-interleave + space-to-depth stem layout variants.

The r4 int8 stereo profile shows ~1.5 ms of layout copies (copy.200-202)
feeding the stem conv at batch 32 (dual-eye): the f32->bf16 cast, the
interleave barrier, and the 6-D s2d transpose each materialize with
mismatched layouts. This measures candidate formulations end-to-end
(inputs -> stem conv output) with profiler device time so the winner can
be wired into _stack_eyes/resnet.

  python tools/bench_stem.py [batch]
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h, w = 288, 1280
    rng = np.random.default_rng(0)
    kern = jnp.asarray(rng.standard_normal((4, 4, 12, 64)).astype(np.float32),
                       jnp.bfloat16)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def s2d(x):
        b, hh, ww, c = x.shape
        x = x.reshape(b, hh // 2, 2, ww // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh // 2, ww // 2, 4 * c)

    def s2d_slices(x):
        return jnp.concatenate(
            [x[:, di::2, dj::2, :] for di in (0, 1) for dj in (0, 1)], axis=-1)

    def stack(l, r):
        b = l.shape[0]
        return jnp.stack([l, r], axis=1).reshape(2 * b, *l.shape[1:])

    B = jax.lax.optimization_barrier

    def v0_current(l, r):  # barrier after stack (today's _stack_eyes)
        return conv(s2d(B(stack(l.astype(jnp.bfloat16), r.astype(jnp.bfloat16)))))

    def v1_two_barriers(l, r):
        x = B(stack(l.astype(jnp.bfloat16), r.astype(jnp.bfloat16)))
        return conv(B(s2d(x)))

    def v2_barrier_after_s2d(l, r):  # fuse stack+s2d, pin only the result
        x = stack(l.astype(jnp.bfloat16), r.astype(jnp.bfloat16))
        return conv(B(s2d(x)))

    def v3_slices(l, r):  # strided-slice s2d instead of 6-D transpose
        x = B(stack(l.astype(jnp.bfloat16), r.astype(jnp.bfloat16)))
        return conv(B(s2d_slices(x)))

    def v4_per_eye_s2d(l, r):  # s2d each eye, then interleave
        ls = s2d(l.astype(jnp.bfloat16))
        rs = s2d(r.astype(jnp.bfloat16))
        return conv(B(stack(ls, rs)))

    def v5_no_barriers(l, r):  # the r3 disaster control
        return conv(s2d(stack(l.astype(jnp.bfloat16), r.astype(jnp.bfloat16))))

    argsets = [
        (jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32)),
         jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32)))
        for _ in range(3)]

    for name, fn in [('v0_current', v0_current),
                     ('v1_two_barriers', v1_two_barriers),
                     ('v2_barrier_after_s2d', v2_barrier_after_s2d),
                     ('v3_slices', v3_slices),
                     ('v4_per_eye_s2d', v4_per_eye_s2d),
                     ('v5_no_barriers', v5_no_barriers)]:
        ms = device_ms(jax.jit(fn), argsets)
        print(f'{name:24s} {ms:7.3f} ms', flush=True)


if __name__ == '__main__':
    main()
