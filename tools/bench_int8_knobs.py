"""Measure the int8 batch-16 forward under the int8 selection knobs.

VERDICT r5 #2: (a) VD3D_INT8_ALL (quantize the final prediction convs too),
(b) VD3D_INT8_S2D (stride-2 convs via the exact space-to-depth
reformulation, models/quant.py _s2d_conv_int8), (c) VD3D_INT8_MINCH=128
(keep memory-bound 64-ch convs bf16). Each variant recalibrates +
requantizes (selection is env-dependent) and reports profiler device time
on distinct host-uploaded inputs.

  python tools/bench_int8_knobs.py [batch] [variants...] [--model=stereo|mono]
    variants: base all s2d all+s2d minch128 ...   (default: all)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from tpu_time import device_ms

KITTI_P2 = np.array([
    [721.5377, 0.0, 609.5593, 44.85728],
    [0.0, 721.5377, 72.854, 0.2163791],
    [0.0, 0.0, 1.0, 0.002745884]], np.float32)

VARIANTS = {
    'base': {},
    'all': {'VD3D_INT8_ALL': '1'},
    's2d': {'VD3D_INT8_S2D': '1'},
    'all+s2d': {'VD3D_INT8_ALL': '1', 'VD3D_INT8_S2D': '1'},
    # keep the memory-bound 64-ch layer1 convs bf16: tests whether the
    # restored bf16 stem layout (r5 profile: the int8 (4,1) retile costs
    # ~6 ms of stem-region layout traffic) wins more than 64-ch int8 saves
    'minch128': {'VD3D_INT8_MINCH': '128'},
    'minch128+all': {'VD3D_INT8_MINCH': '128', 'VD3D_INT8_ALL': '1'},
    'minch128+all+s2d': {'VD3D_INT8_MINCH': '128', 'VD3D_INT8_ALL': '1',
                         'VD3D_INT8_S2D': '1'},
    # fused BasicBlock chains (quant.py collect_block_entries): whole
    # stride-1 identity blocks as one quantize->conv->requant->conv->
    # residual chain — targets the r5 profile's ~9 ms of layer1 s32/f32
    # HBM round-trips (docs/int8_roofline.md)
    'block': {'VD3D_INT8_BLOCK': '1'},
    'all+block': {'VD3D_INT8_ALL': '1', 'VD3D_INT8_BLOCK': '1'},
}


def _build_mono(image_hw):
    import tempfile
    from visualdet3d_tpu.registry import DETECTOR_DICT
    import visualdet3d_tpu.models  # noqa: F401
    from visualdet3d_tpu.testing import gac_detector_cfg, write_synthetic_priors

    pre = os.path.join(tempfile.gettempdir(), 'vd3d_graft_priors_mono')
    write_synthetic_priors(pre, ['Car', 'Pedestrian'])
    cfg = gac_detector_cfg(pre, obj_types=('Car', 'Pedestrian'))
    return DETECTOR_DICT[cfg.name](cfg)


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_system
    from visualdet3d_tpu.models import quant

    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    model = 'stereo'
    for a in sys.argv[1:]:
        if a.startswith('--model='):
            model = a.split('=', 1)[1]
    batch = int(args[0]) if args else 16
    names = args[1:] or list(VARIANTS)

    image_hw = (288, 1280)
    system = _build_system(image_hw) if model == 'stereo' else _build_mono(image_hw)
    system.cfg.inference_dtype = 'int8'
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)
    system.anchor_pack(image_hw)
    folded = system.fold_inference_variables(variables, image_hw)

    crng = np.random.default_rng(0)
    P2c = jnp.asarray(np.tile(KITTI_P2, (2, 1, 1)))

    def imgs(r, n):
        return jnp.asarray(r.standard_normal((n, *image_hw, 3)).astype(np.float32))

    if model == 'stereo':
        calib = [(imgs(crng, 2), imgs(crng, 2), P2c) for _ in range(2)]
    else:
        calib = [(imgs(crng, 2), P2c) for _ in range(2)]

    rng = np.random.default_rng(0)
    P2 = jnp.asarray(np.tile(KITTI_P2, (batch, 1, 1)))
    n_img = 2 if model == 'stereo' else 1
    sets = [tuple(imgs(rng, batch) for _ in range(n_img)) for _ in range(4)]

    for name in names:
        env = VARIANTS[name]
        for k in ('VD3D_INT8_ALL', 'VD3D_INT8_S2D', 'VD3D_INT8_MINCH',
                  'VD3D_INT8_BLOCK'):
            os.environ.pop(k, None)
        os.environ.update(env)
        absmax = system.calibrate_int8(folded, calib)
        qvars = jax.device_put(system.quantize_int8(folded, absmax, image_hw))
        n_q = len(quant.flatten_quant(qvars[quant.QUANT_COLLECTION]))

        @jax.jit
        def forward(v, *a):
            out = system.predict(v, *a, max_detections=32)
            return out['scores'], out['bboxes'], out['labels'], out['valid']

        jax.block_until_ready(forward(qvars, *sets[0], P2))
        ms = device_ms(forward, [(qvars, *s, P2) for s in sets], iters=8)
        print(f'{model}/{name:8s}: {ms:7.2f} ms/batch-{batch}  '
              f'{batch / ms * 1000:6.1f} fps  ({n_q} quantized convs)',
              flush=True)


if __name__ == '__main__':
    main()
