"""Produce a reusable int8 inference artifact from a trained checkpoint.

Config-surface analogue of the reference's checkpoint tooling (the
reference has no quantization; its public contract is config + CLI,
scripts/eval.py:14-55): load the train checkpoint named by the config,
BN-fold, calibrate activation scales on real frames drawn from the
dataset split, quantize (models/quant.py), and save the variables (params
+ int8 'quant' collection) with checkpoint.save_params. `vd3d-eval
--quantized_path <out>` then runs int8 without re-calibrating.

Usage:
  vd3d-quantize --config=configs/stereo3d.py \
      --checkpoint_path=workdirs/Stereo3D/checkpoint \
      --output_path=workdirs/Stereo3D/quantized \
      [--split=training]
"""
import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='configs/stereo3d.py')
    parser.add_argument('--checkpoint_path', required=True)
    parser.add_argument('--output_path', required=True)
    parser.add_argument('--split', default='training',
                        help='dataset split to draw calibration frames from')
    args = parser.parse_args()

    import jax
    from visualdet3d_tpu.checkpoint import CheckpointManager, save_params
    from visualdet3d_tpu.config import cfg_from_file
    from visualdet3d_tpu.pipelines.inference_prep import calibration_batches
    from visualdet3d_tpu.pipelines.train_state import TrainState
    from visualdet3d_tpu.registry import DATASET_DICT, DETECTOR_DICT
    from visualdet3d_tpu.solver import build_optimizer
    import visualdet3d_tpu.models  # noqa: F401
    import visualdet3d_tpu.pipelines  # noqa: F401
    import visualdet3d_tpu.data  # noqa: F401

    cfg = cfg_from_file(args.config)
    dataset_name = (cfg.data.train_dataset if args.split == 'training'
                    else cfg.data.val_dataset)
    dataset = DATASET_DICT[dataset_name](cfg, args.split)

    system = DETECTOR_DICT[cfg.detector.name](cfg.detector)
    image_hw = tuple(cfg.data.rgb_shape[:2])
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)

    ckpt = CheckpointManager(args.checkpoint_path)
    tx = build_optimizer(cfg.optimizer, cfg.get('scheduler'))
    template = TrainState(step=np.zeros((), np.int32),
                          params=variables['params'],
                          batch_stats=variables.get('batch_stats', {}),
                          opt_state=tx.init(variables['params']))
    restored = ckpt.restore(template)
    assert restored is not None, f'no checkpoint in {args.checkpoint_path}'
    variables = {'params': restored.params,
                 'batch_stats': restored.batch_stats}

    folded = system.fold_inference_variables(variables, image_hw)
    batches = calibration_batches(cfg, system, dataset)
    print(f'calibrating on {len(batches)} batches from {args.split}')
    absmax = system.calibrate_int8(folded, batches)
    qvars = system.quantize_int8(folded, absmax, image_hw)
    n_q = len(jax.tree_util.tree_leaves(qvars.get('quant', {})))
    save_params(args.output_path, qvars)
    print(f'saved int8 artifact ({n_q} quant leaves) to {args.output_path}')


if __name__ == '__main__':
    main()
