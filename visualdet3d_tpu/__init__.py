"""visualdet3d_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for visual 3D
detection on KITTI — monocular 3D, stereo 3D, 2D detection, and monocular
depth prediction.

Built from scratch against the capabilities of Owen-Liuyuxuan/visualDet3D
(mounted read-only at /root/reference). The compute path is JAX/XLA with
Pallas TPU kernels for the hot ops; the design is functional (flax.linen
modules, pure jitted step functions, fixed static shapes, device meshes for
data parallelism) rather than a translation of the reference's
PyTorch/CUDA patterns.
"""

__version__ = '0.1.0'

from visualdet3d_tpu.config import EasyDict, cfg_from_file
from visualdet3d_tpu.registry import (
    AUGMENTATION_DICT,
    BACKBONE_DICT,
    DATASET_DICT,
    DETECTOR_DICT,
    PIPELINE_DICT,
    SAMPLER_DICT,
    Registry,
)
