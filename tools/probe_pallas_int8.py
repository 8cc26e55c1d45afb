"""Probe Mosaic support + speed for the fused int8 BasicBlock kernel plan.

Plan B for the layer1 int8 fat (docs/int8_roofline.md): a Pallas kernel
computing a whole quantized 64-ch BasicBlock per batch item in VMEM needs
  (a) int8 x int8 -> int32 jnp.dot on the MXU inside a kernel,
  (b) sublane-UNALIGNED static slices of an int8 VMEM ref (conv taps are
      flat-row shifts of dy*(W+2)+dx, any alignment),
  (c) optionally a lane-concat of 9 [M,64] int8 slices into [M,576].
This probes each on the real TPU before any kernel is built.

  python tools/probe_pallas_int8.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from tpu_time import device_ms

    M, K, C = 2560, 576, 64
    rng = np.random.default_rng(0)
    a_np = rng.integers(-127, 128, (M, K), dtype=np.int8)
    b_np = rng.integers(-127, 128, (K, C), dtype=np.int8)

    # (a) plain int8 dot
    def dot_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.int32)

    try:
        out = pl.pallas_call(
            dot_kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.int32),
        )(jnp.asarray(a_np), jnp.asarray(b_np))
        ref = a_np.astype(np.int32) @ b_np.astype(np.int32)
        ok = np.array_equal(np.asarray(out), ref)
        print(f'(a) int8 dot [M,576]x[576,64]: lowers, exact={ok}', flush=True)
    except Exception as e:  # noqa: BLE001
        print(f'(a) int8 dot FAILED: {type(e).__name__}: {str(e)[:300]}')
        return

    # (b) unaligned sublane slices + 9-tap accumulate from one padded buffer
    R = M + 648  # extra rows so every shifted slice stays in-bounds
    x_np = rng.integers(-127, 128, (R, C), dtype=np.int8)
    w_np = rng.integers(-127, 128, (9, C, C), dtype=np.int8)
    shifts = [0, 1, 2, 322, 323, 324, 644, 645, 646]  # dy*(W+2)+dx, W=320

    def taps_kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, C), jnp.int32)
        for i, s in enumerate(shifts):
            acc += jnp.dot(x_ref[s:s + M, :], w_ref[i],
                           preferred_element_type=jnp.int32)
        o_ref[:] = acc

    try:
        out = pl.pallas_call(
            taps_kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.int32),
        )(jnp.asarray(x_np), jnp.asarray(w_np))
        ref = sum(x_np[s:s + M].astype(np.int32) @ w_np[i].astype(np.int32)
                  for i, s in enumerate(shifts))
        ok = np.array_equal(np.asarray(out), ref)
        print(f'(b) 9-tap shifted accumulate: lowers, exact={ok}', flush=True)
        fn = jax.jit(lambda x, w: pl.pallas_call(
            taps_kernel, out_shape=jax.ShapeDtypeStruct((M, C), jnp.int32))(x, w))
        xs = [(jnp.asarray(rng.integers(-127, 128, (R, C), dtype=np.int8)),
               jnp.asarray(w_np)) for _ in range(3)]
        ms = device_ms(fn, xs, iters=16)
        macs = 9 * M * C * C
        print(f'    {ms:.4f} ms  ({2 * macs / ms / 1e9:.1f} GOPS)', flush=True)
    except Exception as e:  # noqa: BLE001
        print(f'(b) taps FAILED: {type(e).__name__}: {str(e)[:300]}')

    # (c) lane-concat of the 9 slices into [M, 576], one dot
    w576_np = np.concatenate([w_np[i] for i in range(9)], axis=0)  # [576, C]

    def concat_kernel(x_ref, w_ref, o_ref):
        cols = [x_ref[s:s + M, :] for s in shifts]
        o_ref[:] = jnp.dot(jnp.concatenate(cols, axis=1), w_ref[:],
                           preferred_element_type=jnp.int32)

    try:
        out = pl.pallas_call(
            concat_kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.int32),
        )(jnp.asarray(x_np), jnp.asarray(w576_np))
        ref = sum(x_np[s:s + M].astype(np.int32) @ w_np[i].astype(np.int32)
                  for i, s in enumerate(shifts))
        ok = np.array_equal(np.asarray(out), ref)
        print(f'(c) concat-576 dot: lowers, exact={ok}', flush=True)
        fn = jax.jit(lambda x, w: pl.pallas_call(
            concat_kernel, out_shape=jax.ShapeDtypeStruct((M, C), jnp.int32))(x, w))
        xs = [(jnp.asarray(rng.integers(-127, 128, (R, C), dtype=np.int8)),
               jnp.asarray(w576_np)) for _ in range(3)]
        ms = device_ms(fn, xs, iters=16)
        macs = 9 * M * C * C
        print(f'    {ms:.4f} ms  ({2 * macs / ms / 1e9:.1f} GOPS)', flush=True)
    except Exception as e:  # noqa: BLE001
        print(f'(c) concat FAILED: {type(e).__name__}: {str(e)[:300]}')


if __name__ == '__main__':
    main()
