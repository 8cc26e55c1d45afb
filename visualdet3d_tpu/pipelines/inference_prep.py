"""Config-driven inference-variable preparation (fold / cast / quantize).

The reference's public surface is config + CLI (reference
scripts/eval.py:14-55 resolves everything from the config file via
utils/utils.py:137 ``cfg_from_file``); this module extends that contract to
the TPU inference dtypes so ``vd3d-eval --config X`` with

    detector.inference_dtype = 'int8'          # or 'bfloat16'
    detector.calibration = edict(num_batches=8, batch_size=2)

reproduces the parity-gated int8 path (models/quant.py) with NO Python-API
calls: BN folding, activation-scale calibration on real images drawn from
the dataset, weight quantization, and (optionally) a reusable quantized
artifact via checkpoint.save_params / load_params.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def calibration_batches(cfg, system, dataset) -> list:
    """Draw calibration batches from a dataset (evenly spaced frames).

    ``detector.calibration``: num_batches (default 8), batch_size (default
    2). Returns the ``system._eval_apply`` input tuples that
    ``calibrate_int8`` consumes.
    """
    import jax.numpy as jnp

    calib_cfg = cfg.detector.get('calibration', {})
    num_batches = int(calib_cfg.get('num_batches', 8))
    batch_size = int(calib_cfg.get('batch_size', 2))
    n_frames = min(len(dataset), num_batches * batch_size)
    indices = np.linspace(0, len(dataset) - 1, n_frames).astype(int)
    batches = []
    for b in range(0, n_frames, batch_size):
        items = [dataset[int(i)] for i in indices[b:b + batch_size]]
        collated = dataset.collate_fn(items)
        inputs = system.int8_calib_inputs(collated)
        batches.append(tuple(jnp.asarray(x) for x in inputs))
    return batches


def prepare_inference_variables(cfg, system, variables, dataset=None,
                                quantized_path: Optional[str] = None):
    """Apply ``cfg.detector.inference_dtype`` to restored train variables.

    float32 (default): returned unchanged — bit-identical to the training
    graph, like the reference's eval. bfloat16: BN-fold then cast floats.
    int8: BN-fold, calibrate on ``dataset`` frames (or load a previously
    saved artifact from ``quantized_path``), quantize (models/quant.py).
    The result feeds ``system.predict`` directly.
    """
    import jax
    from visualdet3d_tpu.models.detectors.yolo3d import cast_floating

    dtype = cfg.detector.get('inference_dtype', 'float32')
    if dtype == 'float32':
        return variables
    image_hw = tuple(cfg.data.rgb_shape[:2])
    if dtype == 'int8':
        if quantized_path:
            from visualdet3d_tpu.checkpoint import load_params
            restored = load_params(quantized_path)
            assert 'quant' in restored, (
                f'{quantized_path} is not a quantized artifact '
                f'(missing the quant collection)')
            return jax.device_put(restored)
        assert dataset is not None, (
            "inference_dtype='int8' needs a dataset for calibration "
            "(or a --quantized_path artifact from vd3d-quantize)")
        folded = system.fold_inference_variables(variables, image_hw)
        batches = calibration_batches(cfg, system, dataset)
        absmax = system.calibrate_int8(folded, batches)
        return jax.device_put(system.quantize_int8(folded, absmax, image_hw))
    folded = system.fold_inference_variables(variables, image_hw)
    return jax.device_put(cast_floating(folded, dtype))
