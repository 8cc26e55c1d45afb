"""YOLOStereo3D with the int8 MXU inference path enabled from the config.

Same training graph as configs/stereo3d.py; at eval/test time the conv
trunk runs as int8 MXU gemms (models/quant.py — measured ~1.3-1.4x the
bf16 forward at batch 16 on v5e, parity-gated by tests/test_quant.py).
Calibration frames are drawn from the dataset split by
pipelines/inference_prep.py; `vd3d-quantize` saves a reusable artifact.

reference surface contract: configs are the public API
(visualDet3D/config/*.py + scripts/eval.py:14-55).
"""
import importlib.util as _ilu
import os as _os

from visualdet3d_tpu.config import EasyDict as edict

_spec = _ilu.spec_from_file_location(
    'stereo3d_base',
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), 'stereo3d.py'))
_base = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_base)

cfg = _base.cfg
cfg.detector.inference_dtype = 'int8'
# activation-scale calibration: frames drawn evenly from the split
cfg.detector.calibration = edict(num_batches=8, batch_size=2)
# also quantize the final prediction convs: measured -1.0 ms of batch-16
# device time (tools/bench_int8_knobs.py 'all'), parity-gated by
# tests/test_quant.py::test_int8_all_and_s2d_gates
cfg.detector.int8_all = True
