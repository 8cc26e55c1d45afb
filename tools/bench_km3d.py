"""KM3D (DLA-34 CenterNet-style) forward throughput on one TPU chip.

DLA-34's IDAUp/DLAUp nodes are DCN blocks, so this benchmark tracks the
deformable-conv path end to end. Device time comes from the profiler
(tools/tpu_time.py) — wall-clock loops can be elided by the axon relay.

Run: python tools/bench_km3d.py [batch] [dtype]
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

    from visualdet3d_tpu.config import EasyDict as edict
    from visualdet3d_tpu.registry import DETECTOR_DICT
    import visualdet3d_tpu.models  # noqa: F401
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else 'bfloat16'
    image_hw = (384, 1280)

    cfg = edict(
        obj_types=['Car'],
        name='KM3D',
        backbone=edict(name='dla', depth=34),
        head=edict(
            layer_cfg=edict(
                input_features=64, head_features=256,
                head_dict={'hm': 1, 'wh': 2, 'hps': 18, 'rot': 8, 'dim': 3,
                           'prob': 1, 'reg': 2, 'hm_hp': 9, 'hp_offset': 2}),
            loss_cfg=edict(rampup_length=100),
            test_cfg=edict(score_thr=0.1, nms_iou_thr=0.5, top_k=100),
        ),
    )
    system = DETECTOR_DICT['KM3D'](cfg)
    variables = system.init(jax.random.PRNGKey(0), image_hw)
    if dtype != 'float32':
        variables = jax.device_put(cast_floating(variables, dtype))

    P2 = jnp.asarray(np.tile(np.array([
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ], np.float32), (batch, 1, 1)))

    @jax.jit
    def forward(v, im, p):
        out = system.predict(v, im, p, max_detections=32)
        return out['scores'], out['bboxes'], out['labels']

    rng = np.random.default_rng(0)
    argsets = [(variables,
                jnp.asarray(rng.standard_normal(
                    (batch, *image_hw, 3)).astype(np.float32)), P2)
               for _ in range(4)]
    ms = device_ms(forward, argsets)
    print(json.dumps({
        'km3d_fwd_fps': round(batch / ms * 1000, 1),
        'km3d_fwd_ms': round(ms, 2),
        'batch': batch, 'image_hw': list(image_hw), 'dtype': dtype,
    }))


if __name__ == '__main__':
    main()
