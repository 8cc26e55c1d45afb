"""Stereo3D training-step throughput on one TPU chip.

Full step: doubled-batch backbone, Pallas cost volumes, detection + depth
losses, gradients, global-norm clip, adam update. Device time from the
profiler (tools/tpu_time.py).

Run: python tools/bench_train.py [batch] [remat|bf16|remat+bf16]
  bf16 = mixed precision (bf16 compute / f32 master params+grads,
  train_state._mixed_precision_interceptor)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

from tpu_time import device_ms


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_system
    from visualdet3d_tpu.config import EasyDict as edict
    from visualdet3d_tpu.pipelines.train_state import (
        create_train_state, make_stereo_train_step)
    from visualdet3d_tpu.solver import build_optimizer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mode = sys.argv[2] if len(sys.argv) > 2 else ''
    remat = 'remat' in mode
    compute_dtype = 'bfloat16' if 'bf16' in mode else None
    image_hw = (288, 1280)
    system = _build_system(image_hw)
    if remat:
        system.cfg.backbone.remat = True
        system.__init__(system.cfg)  # rebuild the net with remat blocks

    tx = build_optimizer(
        edict(type_name='adam', keywords=edict(lr=1e-4),
              clipped_gradient_norm=35.0))
    state = create_train_state(system, jax.random.PRNGKey(0), image_hw, tx,
                               batch_size=1)
    step = make_stereo_train_step(system, tx, donate=False,
                                  compute_dtype=compute_dtype)

    rng = np.random.default_rng(0)
    ann = np.full((batch, 32, 12), -1.0, np.float32)
    ann[:, 0] = [300, 120, 420, 200, 0, 360, 160, 20.0, 1.6, 1.5, 3.9, 0.4]
    ann[:, 1] = [600, 130, 700, 190, 0, 650, 160, 28.0, 1.7, 1.6, 4.1, -0.9]

    def make_batch():
        return dict(
            left_images=jnp.asarray(rng.standard_normal(
                (batch, *image_hw, 3)).astype(np.float32)),
            right_images=jnp.asarray(rng.standard_normal(
                (batch, *image_hw, 3)).astype(np.float32)),
            P2=jnp.asarray(np.tile(np.array(
                [[721.5, 0, 609.6, 44.9], [0, 721.5, 72.9, 0.2],
                 [0, 0, 1, 0.003]], np.float32), (batch, 1, 1))),
            P3=jnp.asarray(np.tile(np.array(
                [[721.5, 0, 609.6, -339.5], [0, 721.5, 72.9, 0.2],
                 [0, 0, 1, 0.003]], np.float32), (batch, 1, 1))),
            annotations=jnp.asarray(ann),
            disparity=jnp.asarray(np.abs(rng.standard_normal(
                (batch, image_hw[0] // 4, image_hw[1] // 4))
            ).astype(np.float32) * 20),
        )

    key = jax.random.PRNGKey(1)
    argsets = [(state, make_batch(), key) for _ in range(3)]
    # time the FULL step (returning only the loss would let XLA dead-code
    # eliminate the optimizer update)
    ms = device_ms(step, argsets, iters=6)
    print(json.dumps({
        'stereo_train_step_ms': round(ms, 2),
        'stereo_train_images_per_s': round(batch / ms * 1000, 1),
        'batch': batch, 'image_hw': list(image_hw),
        'dtype': compute_dtype or 'float32', 'remat': remat,
    }))


if __name__ == '__main__':
    main()
