"""Dump the compiled (optimized) HLO of the stereo forward to a file.

  python tools/dump_hlo_stereo.py [batch] [dtype] [out.txt]

Used to map profiler fusion names (tools/profile_stereo.py) back to the
ops inside them — e.g. which 1408-ch convs did NOT get int8-quantized.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_system
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else 'int8'
    out_path = sys.argv[3] if len(sys.argv) > 3 else '/tmp/stereo_hlo.txt'

    image_hw = (288, 1280)
    system = _build_system(image_hw)
    system.cfg.inference_dtype = dtype
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)
    system.anchor_pack(image_hw)
    variables = system.fold_inference_variables(variables, image_hw)
    if dtype == 'int8':
        crng = np.random.default_rng(9)
        P2c = jnp.asarray(np.tile(np.array([
            [721.5377, 0.0, 609.5593, 44.85728],
            [0.0, 721.5377, 72.854, 0.2163791],
            [0.0, 0.0, 1.0, 0.002745884]], np.float32), (2, 1, 1)))
        calib = [(jnp.asarray(crng.standard_normal((2, *image_hw, 3)).astype(np.float32)),
                  jnp.asarray(crng.standard_normal((2, *image_hw, 3)).astype(np.float32)),
                  P2c) for _ in range(2)]
        absmax = system.calibrate_int8(variables, calib)
        variables = jax.device_put(system.quantize_int8(variables, absmax, image_hw))
    elif dtype != 'float32':
        variables = jax.device_put(cast_floating(variables, dtype))

    def forward(variables, left, right, P2):
        out = system.predict(variables, left, right, P2, max_detections=32)
        return out['scores'], out['bboxes'], out['labels'], out['valid']

    P2 = jnp.asarray(np.tile(np.array([
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 72.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884]], np.float32), (batch, 1, 1)))
    l = jax.ShapeDtypeStruct((batch, *image_hw, 3), jnp.float32)
    r = jax.ShapeDtypeStruct((batch, *image_hw, 3), jnp.float32)
    compiled = jax.jit(forward).lower(variables, l, r, P2).compile()
    txt = compiled.as_text()
    with open(out_path, 'w') as f:
        f.write(txt)
    print(f'wrote {len(txt)} chars to {out_path}', flush=True)


if __name__ == '__main__':
    main()
