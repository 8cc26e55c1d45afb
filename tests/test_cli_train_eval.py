"""User-facing CLI entry points executed end-to-end on the mini-KITTI
fixture (VERDICT r4 #4/#6): cli/train.py:main (epoch loop, checkpointing,
auto-resume, per-epoch eval, scheduler unit conversion — reference
scripts/train.py:144-196), cli/eval.py:main honoring
detector.inference_dtype='int8' purely from the config file, and
cli/quantize.py:main producing a reusable int8 artifact."""
import os
import pickle
import sys

import numpy as np
import pytest

import jax

from visualdet3d_tpu.config import EasyDict as edict

from test_end_to_end import make_full_cfg


@pytest.fixture(scope='module')
def cli_env(tmp_path_factory):
    """Full config on disk (the public surface: a python file defining cfg)
    plus work dirs. The config file loads a pickled EasyDict so the CLI path
    exercises cfg_from_file on the exact fixture config."""
    cfg = make_full_cfg(str(tmp_path_factory.mktemp('kitti')),
                        str(tmp_path_factory.mktemp('pre')),
                        str(tmp_path_factory.mktemp('split')))
    work = tmp_path_factory.mktemp('work')
    cfg.path.log_path = str(work / 'log')
    cfg.path.checkpoint_path = str(work / 'checkpoint')
    cfg.trainer.max_epochs = 1
    cfg.trainer.test_iter = 1      # eval fires after every epoch
    cfg.trainer.disp_iter = 1
    cfg.detector.head.test_cfg.post_optimization = False

    pkl = work / 'cfg.pkl'
    with open(pkl, 'wb') as f:
        pickle.dump(dict(cfg), f)
    cfg_file = work / 'mini_gac.py'
    cfg_file.write_text(
        'import pickle\n'
        'from visualdet3d_tpu.config import EasyDict\n'
        f'with open({str(pkl)!r}, "rb") as f:\n'
        '    cfg = EasyDict(pickle.load(f))\n')
    return edict(cfg=cfg, cfg_file=str(cfg_file), work=str(work),
                 pkl=str(pkl))


def _run_main(module, argv, monkeypatch):
    monkeypatch.setattr(sys, 'argv', ['prog'] + argv)
    module.main()


def test_cli_train_checkpoint_eval_resume(cli_env, monkeypatch, capsys):
    from visualdet3d_tpu.cli import train as train_cli
    import visualdet3d_tpu.solver as solver

    # capture the epoch->step scheduler unit conversion main performs
    seen_units = {}
    real_build = solver.build_optimizer

    def spy_build(optim_cfg, scheduler_cfg=None, steps_per_unit=1):
        seen_units['steps_per_unit'] = steps_per_unit
        return real_build(optim_cfg, scheduler_cfg,
                          steps_per_unit=steps_per_unit)

    monkeypatch.setattr(solver, 'build_optimizer', spy_build)
    _run_main(train_cli, ['--config', cli_env.cfg_file], monkeypatch)

    cfg = cli_env.cfg
    # 3 train frames double to 6 images (P3 right-image doubling in the GAC
    # mono dataset, mono_dataset.py) -> 6 // batch_size steps per epoch
    steps_per_epoch = max(6 // cfg.data.batch_size, 1)
    # epoch-based scheduler: units converted to steps (train.py:86-87)
    assert seen_units['steps_per_unit'] == steps_per_epoch

    # checkpoint written at epoch end with the global step
    from visualdet3d_tpu.checkpoint import CheckpointManager
    ckpt = CheckpointManager(cfg.path.checkpoint_path)
    assert ckpt.latest_step() == steps_per_epoch

    # eval-every-test_iter fired and wrote KITTI txt results
    result_dir = os.path.join(cfg.path.preprocessed_path, 'validation', 'data')
    assert sorted(os.listdir(result_dir)) == ['000000.txt', '000001.txt']

    # auto-resume: second run with one more epoch restores the step count
    with open(cli_env.pkl, 'rb') as f:
        raw = pickle.load(f)
    raw['trainer']['max_epochs'] = 2
    with open(cli_env.pkl, 'wb') as f:
        pickle.dump(raw, f)
    _run_main(train_cli, ['--config', cli_env.cfg_file, '--resume'],
              monkeypatch)
    out = capsys.readouterr().out
    assert f'resumed from step {steps_per_epoch} (epoch 1)' in out
    ckpt2 = CheckpointManager(cfg.path.checkpoint_path)
    assert ckpt2.latest_step() == 2 * steps_per_epoch


def test_cli_eval_int8_from_config(cli_env, monkeypatch):
    """vd3d-eval --config X with detector.inference_dtype='int8' runs the
    whole evaluate pipeline quantized, no Python-API calls (VERDICT r4 #4)."""
    from visualdet3d_tpu.cli import eval as eval_cli

    with open(cli_env.pkl, 'rb') as f:
        raw = pickle.load(f)
    raw['detector']['inference_dtype'] = 'int8'
    raw['detector']['calibration'] = {'num_batches': 1, 'batch_size': 2}
    int8_pkl = os.path.join(cli_env.work, 'cfg_int8.pkl')
    with open(int8_pkl, 'wb') as f:
        pickle.dump(raw, f)
    int8_cfg_file = os.path.join(cli_env.work, 'mini_gac_int8.py')
    with open(int8_cfg_file, 'w') as f:
        f.write('import pickle\n'
                'from visualdet3d_tpu.config import EasyDict\n'
                f'with open({int8_pkl!r}, "rb") as fh:\n'
                '    cfg = EasyDict(pickle.load(fh))\n')

    result_dir = os.path.join(cli_env.cfg.path.preprocessed_path,
                              'validation', 'data')
    _run_main(eval_cli, ['--config', int8_cfg_file,
                         '--checkpoint_path', cli_env.cfg.path.checkpoint_path],
              monkeypatch)
    assert sorted(os.listdir(result_dir)) == ['000000.txt', '000001.txt']

    # quantize CLI: save a reusable artifact, then eval from it
    from visualdet3d_tpu.cli import quantize as quantize_cli
    artifact = os.path.join(cli_env.work, 'quantized')
    _run_main(quantize_cli, ['--config', int8_cfg_file,
                             '--checkpoint_path',
                             cli_env.cfg.path.checkpoint_path,
                             '--output_path', artifact], monkeypatch)
    from visualdet3d_tpu.checkpoint import load_params
    restored = load_params(artifact)
    assert 'quant' in restored and len(
        jax.tree_util.tree_leaves(restored['quant'])) > 0
    _run_main(eval_cli, ['--config', int8_cfg_file,
                         '--checkpoint_path', cli_env.cfg.path.checkpoint_path,
                         '--quantized_path', artifact], monkeypatch)
    assert sorted(os.listdir(result_dir)) == ['000000.txt', '000001.txt']
