"""Single-image demo: run a trained detector on one KITTI frame and render
2D boxes + projected 3D wireframes.

TPU-native analogue of the reference's demos/ notebooks.

  python tools/demo.py --config=configs/stereo3d.py \
      --checkpoint_path=workdirs/Stereo3D/checkpoint --index 0 --out demo.png
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='configs/stereo3d.py')
    parser.add_argument('--checkpoint_path', required=True)
    parser.add_argument('--index', type=int, default=0)
    parser.add_argument('--split', default='validation')
    parser.add_argument('--out', default='demo.png')
    args = parser.parse_args()

    import cv2
    import numpy as np
    import jax

    from visualdet3d_tpu import geometry
    from visualdet3d_tpu.checkpoint import CheckpointManager
    from visualdet3d_tpu.config import cfg_from_file
    from visualdet3d_tpu.pipelines.train_state import TrainState
    from visualdet3d_tpu.registry import DATASET_DICT, DETECTOR_DICT, PIPELINE_DICT
    from visualdet3d_tpu.solver import build_optimizer
    from visualdet3d_tpu.utils.visualization import draw_3d_box
    import visualdet3d_tpu.models  # noqa: F401
    import visualdet3d_tpu.pipelines  # noqa: F401
    import visualdet3d_tpu.data  # noqa: F401

    cfg = cfg_from_file(args.config)
    dataset = DATASET_DICT[cfg.data.val_dataset](cfg, args.split)
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
    assert restored is not None, 'no checkpoint found'
    variables = {'params': restored.params, 'batch_stats': restored.batch_stats}

    data = dataset[args.index]
    collated = dataset.collate_fn([data])
    test_fn = PIPELINE_DICT[cfg.trainer.test_func](system)
    scores, bbox, obj_names = test_fn(variables, collated)

    # denormalise the (left) image for rendering
    aug = cfg.data.augmentation
    image = data['image'][0] if isinstance(data['image'], list) else data['image']
    img = np.clip((image * np.asarray(aug.rgb_std) +
                   np.asarray(aug.rgb_mean)) * 255, 0, 255).astype(np.uint8).copy()
    P2 = data['calib'][0] if isinstance(data['calib'], list) else data['calib']

    for i in range(len(scores)):
        b = bbox[i]
        cv2.rectangle(img, (int(b[0]), int(b[1])), (int(b[2]), int(b[3])),
                      (0, 255, 0), 2)
        if bbox.shape[1] > 4:
            state = geometry.back_projection(b[None, 4:11], P2)[0]
            box7 = np.asarray(state, np.float32)[None]
            _, homo, _ = geometry.project_bbox3d(box7, P2.astype(np.float32))
            draw_3d_box(img, np.asarray(homo)[0].T)
        cv2.putText(img, f'{obj_names[i]} {scores[i]:.2f}',
                    (int(b[0]), max(int(b[1]) - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 255), 1)

    cv2.imwrite(args.out, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    print(f'wrote {args.out} with {len(scores)} detections')


if __name__ == '__main__':
    main()
