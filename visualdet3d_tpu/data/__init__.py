"""Importing this package registers datasets, augmentations, samplers."""
from visualdet3d_tpu.data import augmentations as _augmentations  # noqa: F401
from visualdet3d_tpu.data import samplers as _samplers  # noqa: F401
from visualdet3d_tpu.data.kitti.dataset import mono_dataset as _mono  # noqa: F401
from visualdet3d_tpu.data.kitti.dataset import stereo_dataset as _stereo  # noqa: F401
from visualdet3d_tpu.data.loader import DataLoader, build_dataloader  # noqa: F401

try:
    from visualdet3d_tpu.data.kitti.dataset import km3d_dataset as _km3d  # noqa: F401
except ImportError:
    pass
try:
    from visualdet3d_tpu.data.kitti.dataset import depth_dataset as _depth  # noqa: F401
except ImportError:
    pass
