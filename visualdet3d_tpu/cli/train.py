"""Train a detector from a config file.

TPU-native re-design of the reference entry point (reference
scripts/train.py:26-199): the per-GPU process group + DDP wrapper become a
single-process jitted step over a jax.sharding data mesh (all local devices;
multi-host via --coordinator); SyncBN and the gradient all-reduce fall out of
GSPMD. Checkpointing is orbax with full-state auto-resume.

Usage:
  python scripts/train.py --config=configs/stereo3d.py [--resume]
"""
import argparse
import itertools
import os
import sys

import numpy as np



def device_batch(batch, mesh):
    """Keep array leaves (incl. nested target dicts), shard over data axis."""
    from visualdet3d_tpu.parallel import mesh as mesh_lib
    arrays = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            arrays[k] = v
        elif isinstance(v, dict) and all(isinstance(x, np.ndarray)
                                         for x in v.values()):
            arrays[k] = v
    return mesh_lib.shard_batch(mesh, arrays)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='configs/stereo3d.py')
    parser.add_argument('--experiment_name', default=None)
    parser.add_argument('--resume', action='store_true')
    parser.add_argument('--coordinator', default=None,
                        help='multi-host coordinator address (DCN)')
    parser.add_argument('--num_processes', type=int, default=None)
    parser.add_argument('--process_id', type=int, default=None)
    parser.add_argument('--max_objects', type=int, default=32)
    parser.add_argument('--pretrained_backbone', default=None,
                        help='converted torchvision backbone (msgpack)')
    args = parser.parse_args()

    from visualdet3d_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    import jax
    from visualdet3d_tpu.config import cfg_from_file
    from visualdet3d_tpu.checkpoint import CheckpointManager
    from visualdet3d_tpu.data.loader import build_dataloader
    from visualdet3d_tpu.parallel import mesh as mesh_lib
    from visualdet3d_tpu.pipelines.train_state import create_train_state
    from visualdet3d_tpu.registry import DATASET_DICT, DETECTOR_DICT, PIPELINE_DICT
    from visualdet3d_tpu.solver import build_optimizer
    from visualdet3d_tpu.utils import LossLogger, MetricWriter, Timer
    import visualdet3d_tpu.models  # noqa: F401 (registration)
    import visualdet3d_tpu.pipelines  # noqa: F401
    import visualdet3d_tpu.data  # noqa: F401

    cfg = cfg_from_file(args.config)
    is_main = jax.process_index() == 0

    writer = MetricWriter(cfg.path.log_path) if is_main else None
    loss_logger = LossLogger(writer, 'train') if is_main else None

    # datasets + loaders
    dataset_train = DATASET_DICT[cfg.data.train_dataset](cfg, 'training')
    dataset_val = DATASET_DICT[cfg.data.val_dataset](cfg, 'validation')
    collate = lambda items: dataset_train.collate_fn(
        items, obj_types=cfg.obj_types, max_objects=args.max_objects)
    dataloader_train = build_dataloader(
        dataset_train, num_workers=cfg.data.num_workers,
        batch_size=cfg.data.batch_size, collate_fn=collate,
        local_rank=jax.process_index(), world_size=jax.process_count(),
        training=True)
    steps_per_epoch = max(len(dataset_train) // cfg.data.batch_size, 1)

    # model system + optimizer
    system = DETECTOR_DICT[cfg.detector.name](cfg.detector)
    scheduler_cfg = cfg.get('scheduler', None)
    is_iter_based = (scheduler_cfg or {}).get('is_iter_based', False)
    tx = build_optimizer(cfg.optimizer, scheduler_cfg,
                         steps_per_unit=1 if is_iter_based else steps_per_epoch)

    image_hw = tuple(cfg.data.rgb_shape[:2])
    state = create_train_state(system, jax.random.PRNGKey(0), image_hw, tx,
                               batch_size=1)
    if is_main:
        n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(state.params))
        print(f'number of trained parameters of the model: {n_params:,}')
        if writer:
            writer.add_text('config', str(cfg))

    if args.pretrained_backbone:
        from visualdet3d_tpu.checkpoint import merge_pretrained_backbone
        variables = merge_pretrained_backbone(
            {'params': state.params, 'batch_stats': state.batch_stats},
            args.pretrained_backbone)
        state = state.replace(params=variables['params'],
                              batch_stats=variables['batch_stats'])
        print(f'warm-started backbone from {args.pretrained_backbone}')

    # mesh + sharding: params replicated, batch sharded over data axis
    mesh = mesh_lib.make_mesh()
    state = mesh_lib.replicate(mesh, state)

    ckpt = CheckpointManager(cfg.path.checkpoint_path)
    start_epoch = 0
    if args.resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state = mesh_lib.replicate(mesh, restored)
            start_epoch = int(np.asarray(state.step)) // steps_per_epoch
            print(f'resumed from step {int(np.asarray(state.step))} '
                  f'(epoch {start_epoch})')

    # optional bf16-compute/f32-master mixed precision (train_state.py);
    # the reference trains pure f32, so the default is None
    train_step = PIPELINE_DICT[cfg.trainer.training_func](
        system, tx, compute_dtype=cfg.trainer.get('compute_dtype'))
    evaluate_detection = PIPELINE_DICT.get(cfg.trainer.get('evaluate_func'))

    timer = Timer()
    global_step = start_epoch * steps_per_epoch
    rng = jax.random.PRNGKey(42)
    print(f'Num training images: {len(dataset_train)}; '
          f'{steps_per_epoch} steps/epoch on {jax.device_count()} device(s)')

    for epoch_num in range(start_epoch, cfg.trainer.max_epochs):
        if loss_logger:
            loss_logger.reset()
        data_iter = itertools.islice(iter(dataloader_train), steps_per_epoch)
        # Buffer per-step metrics on device and fetch them in one batch at
        # disp_iter so the logged value is the true every-iteration average
        # (reference train.py:157-167 semantics) without a host sync per step.
        pending_metrics = []
        for iter_num, batch in enumerate(data_iter):
            if cfg.trainer.training_func == 'train_rtm3d':
                batch['epoch'] = np.full((), epoch_num, np.float32)
            step_rng = jax.random.fold_in(rng, global_step)
            state, metrics = train_step(state, device_batch(batch, mesh), step_rng)
            global_step += 1
            timer.tick()
            if is_main and loss_logger:
                pending_metrics.append(metrics)
            if is_main and global_step % cfg.trainer.disp_iter == 0:
                if loss_logger:
                    for m in jax.device_get(pending_metrics):
                        loss_logger.update(m)
                    pending_metrics.clear()
                    loss_logger.log(global_step)
                total = float(np.asarray(metrics['total']))
                eta = timer.compute_eta(
                    global_step, steps_per_epoch * cfg.trainer.max_epochs)
                print(f'Epoch: {epoch_num} | Iteration: {iter_num} | '
                      f'Running loss: {total:1.5f} | eta:{eta}', end='\r')

        if is_main:
            ckpt.save(global_step, jax.device_get(state))

        if (is_main and evaluate_detection is not None and
                cfg.trainer.test_iter > 0 and
                (epoch_num + 1) % cfg.trainer.test_iter == 0):
            print(f'\n/**** start testing after training epoch {epoch_num} ******/')
            variables = {'params': state.params, 'batch_stats': state.batch_stats}
            evaluate_detection(cfg, system, variables, dataset_val, writer,
                               epoch_num)
            print(f'/**** finish testing after training epoch {epoch_num} ******/')

        if writer:
            writer.flush()

    ckpt.close()


if __name__ == '__main__':
    main()
