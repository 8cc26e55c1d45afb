"""Evaluate a trained checkpoint on a KITTI split.

reference: scripts/eval.py:14-55 (checkpoint load with strict=False ->
orbax restore; CUDA device pinning -> nothing to pin, XLA owns the chip).

Usage:
  python scripts/eval.py --config=configs/stereo3d.py \
      --checkpoint_path=workdirs/Stereo3D/checkpoint \
      --split_to_test=validation
"""
import argparse
import os

import numpy as np



def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='configs/stereo3d.py')
    parser.add_argument('--checkpoint_path', required=True)
    parser.add_argument('--split_to_test', default='validation')
    parser.add_argument('--quantized_path', default=None,
                        help='pre-quantized int8 artifact from vd3d-quantize '
                             '(skips on-the-fly calibration)')
    args = parser.parse_args()

    import jax
    from visualdet3d_tpu.checkpoint import CheckpointManager
    from visualdet3d_tpu.config import cfg_from_file
    from visualdet3d_tpu.pipelines.train_state import TrainState
    from visualdet3d_tpu.registry import DATASET_DICT, DETECTOR_DICT, PIPELINE_DICT
    import visualdet3d_tpu.models  # noqa: F401
    import visualdet3d_tpu.pipelines  # noqa: F401
    import visualdet3d_tpu.data  # noqa: F401

    cfg = cfg_from_file(args.config)

    if args.split_to_test == 'training':
        dataset_name = cfg.data.train_dataset
    elif args.split_to_test == 'test':
        dataset_name = cfg.data.test_dataset
        cfg.is_running_test_set = True
    else:
        dataset_name = cfg.data.val_dataset
    dataset = DATASET_DICT[dataset_name](cfg, args.split_to_test)

    system = DETECTOR_DICT[cfg.detector.name](cfg.detector)
    image_hw = tuple(cfg.data.rgb_shape[:2])
    variables = system.init(jax.random.PRNGKey(0), image_hw, batch_size=1)

    ckpt = CheckpointManager(args.checkpoint_path)
    from visualdet3d_tpu.solver import build_optimizer
    from visualdet3d_tpu.config import EasyDict as edict
    tx = build_optimizer(cfg.optimizer, cfg.get('scheduler'))
    template = TrainState(step=np.zeros((), np.int32),
                          params=variables['params'],
                          batch_stats=variables.get('batch_stats', {}),
                          opt_state=tx.init(variables['params']))
    restored = ckpt.restore(template)
    assert restored is not None, f'no checkpoint found in {args.checkpoint_path}'
    variables = {'params': restored.params, 'batch_stats': restored.batch_stats}

    # honor detector.inference_dtype from the config (int8/bf16 TPU paths)
    from visualdet3d_tpu.pipelines.inference_prep import (
        prepare_inference_variables)
    variables = prepare_inference_variables(
        cfg, system, variables, dataset, quantized_path=args.quantized_path)

    evaluate_detection = PIPELINE_DICT[cfg.trainer.evaluate_func]
    evaluate_detection(cfg, system, variables, dataset, None, 0,
                       result_path_split=args.split_to_test)
    print('finish')


if __name__ == '__main__':
    main()
