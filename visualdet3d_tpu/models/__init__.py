"""Importing this package registers all detectors/backbones."""
from visualdet3d_tpu.models.backbones import resnet as _resnet  # noqa: F401
from visualdet3d_tpu.models.detectors import yolo3d as _yolo3d  # noqa: F401
from visualdet3d_tpu.models.detectors import yolostereo3d as _yolostereo3d  # noqa: F401

try:  # families registered as they land
    from visualdet3d_tpu.models.detectors import km3d as _km3d  # noqa: F401
except ImportError:
    pass
try:
    from visualdet3d_tpu.models.detectors import retinanet as _retinanet  # noqa: F401
except ImportError:
    pass
try:
    from visualdet3d_tpu.models.detectors import monodepth as _monodepth  # noqa: F401
except ImportError:
    pass
