"""Import helper for golden-parity tests against the PyTorch reference.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used here only
as a *numerical oracle*: its pure-Python modules are imported (CPU torch) and
executed on randomized inputs so the rebuild can be asserted equal.

The image lacks several of its dependencies; this shim installs minimal,
clearly-labelled stand-ins before any reference import:
  - ``easydict``      -> our own EasyDict (visualdet3d_tpu.config)
  - ``numba``         -> identity ``jit``/``njit`` decorators + ``prange`` =
                         ``range`` + a ``cuda`` stub (decorators only; the
                         GPU rotated-IoU is monkeypatched in the tests)
  - ``torchvision``   -> ``ops.nms`` implemented in pure torch
  - ``visualDet3D.networks.lib.ops`` -> DCN classes as plain conv stand-ins
    (import-time only; parity tests never execute the CUDA DCN)
Also makes ``Tensor.cuda()`` a no-op since the reference hardcodes ``.cuda()``
inside loss bodies (reference networks/heads/losses.py:42-45).
"""
from __future__ import annotations

import sys
import types

REF_ROOT = '/root/reference'

_installed = False


def _easydict_stub():
    from visualdet3d_tpu.config import EasyDict
    m = types.ModuleType('easydict')
    m.EasyDict = EasyDict
    return m


def _numba_stub():
    def _identity_decorator(*args, **kwargs):
        if args and callable(args[0]) and len(args) == 1 and not kwargs:
            return args[0]
        return lambda f: f

    numba = types.ModuleType('numba')
    numba.jit = _identity_decorator
    numba.njit = _identity_decorator
    numba.prange = range
    numba.float32 = float
    numba.float64 = float
    numba.int32 = int
    numba.int64 = int
    numba.boolean = bool

    cuda = types.ModuleType('numba.cuda')
    cuda.jit = _identity_decorator
    numba.cuda = cuda
    sys.modules['numba.cuda'] = cuda
    return numba


def _skimage_stub():
    import numpy as np

    sk = types.ModuleType('skimage')
    io = types.ModuleType('skimage.io')

    def imread(path):
        from PIL import Image
        return np.array(Image.open(path))

    io.imread = imread

    measure = types.ModuleType('skimage.measure')

    def block_reduce(image, block_size, func=np.sum, cval=0.0):
        shape = image.shape
        pads = [(0, (-s) % b) for s, b in zip(shape, block_size)]
        padded = np.pad(image, pads, constant_values=cval)
        new_shape = []
        for s, b in zip(padded.shape, block_size):
            new_shape += [s // b, b]
        reshaped = padded.reshape(new_shape)
        axes = tuple(range(1, reshaped.ndim, 2))
        return func(reshaped, axis=axes)

    measure.block_reduce = block_reduce
    sk.io = io
    sk.measure = measure
    sys.modules['skimage.io'] = io
    sys.modules['skimage.measure'] = measure
    return sk


def _torchvision_stub():
    import torch

    def nms(boxes: 'torch.Tensor', scores: 'torch.Tensor', iou_threshold: float):
        """Greedy axis-aligned NMS, matching torchvision.ops.nms semantics."""
        order = torch.argsort(scores, descending=True)
        keep = []
        suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
        areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * \
                (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
        for idx in order.tolist():
            if suppressed[idx]:
                continue
            keep.append(idx)
            lt = torch.maximum(boxes[idx, :2], boxes[:, :2])
            rb = torch.minimum(boxes[idx, 2:], boxes[:, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[:, 0] * wh[:, 1]
            iou = inter / (areas[idx] + areas - inter).clamp(min=1e-12)
            suppressed |= iou > iou_threshold
        return torch.as_tensor(keep, dtype=torch.long)

    tv = types.ModuleType('torchvision')
    ops = types.ModuleType('torchvision.ops')
    ops.nms = nms
    tv.ops = ops
    sys.modules['torchvision.ops'] = ops
    return tv


def _dcn_stub():
    import torch.nn as nn

    class ModulatedDeformConvPack(nn.Conv2d):
        """Import-time stand-in; never executed by parity tests."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias=True, **kwargs):
            super().__init__(in_channels, out_channels, kernel_size,
                             stride=stride, padding=padding,
                             dilation=dilation, groups=groups, bias=bias)

    class DeformConvPack(ModulatedDeformConvPack):
        pass

    ops = types.ModuleType('visualDet3D.networks.lib.ops')
    ops.__path__ = []  # mark as package so submodule imports resolve via sys.modules
    ops.ModulatedDeformConvPack = ModulatedDeformConvPack
    ops.DeformConvPack = DeformConvPack

    dcn_pkg = types.ModuleType('visualDet3D.networks.lib.ops.dcn')
    dcn_pkg.__path__ = []
    dcn_mod = types.ModuleType('visualDet3D.networks.lib.ops.dcn.deform_conv')
    dcn_mod.ModulatedDeformConvPack = ModulatedDeformConvPack
    dcn_mod.DeformConvPack = DeformConvPack
    dcn_mod.DeformConv = DeformConvPack
    dcn_mod.ModulatedDeformConv = ModulatedDeformConvPack
    dcn_pkg.deform_conv = dcn_mod
    ops.dcn = dcn_pkg
    sys.modules['visualDet3D.networks.lib.ops.dcn'] = dcn_pkg
    sys.modules['visualDet3D.networks.lib.ops.dcn.deform_conv'] = dcn_mod

    iou3d_pkg = types.ModuleType('visualDet3D.networks.lib.ops.iou3d')
    iou3d_mod = types.ModuleType('visualDet3D.networks.lib.ops.iou3d.iou3d')

    def boxes_iou3d_gpu(*a, **k):
        raise RuntimeError('CUDA iou3d not available in parity tests')

    iou3d_mod.boxes_iou3d_gpu = boxes_iou3d_gpu
    iou3d_pkg.iou3d = iou3d_mod
    ops.iou3d = iou3d_pkg
    sys.modules['visualDet3D.networks.lib.ops.iou3d'] = iou3d_pkg
    sys.modules['visualDet3D.networks.lib.ops.iou3d.iou3d'] = iou3d_mod
    return ops


def install():
    """Install stubs + sys.path so ``import visualDet3D.…`` works. Idempotent."""
    global _installed
    if _installed:
        return
    import torch

    if 'easydict' not in sys.modules:
        try:
            import easydict  # noqa: F401
        except ImportError:
            sys.modules['easydict'] = _easydict_stub()
    if 'numba' not in sys.modules:
        try:
            import numba  # noqa: F401
        except ImportError:
            sys.modules['numba'] = _numba_stub()
    if 'skimage' not in sys.modules:
        try:
            import skimage  # noqa: F401
        except ImportError:
            sys.modules['skimage'] = _skimage_stub()
    if 'torchvision' not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            sys.modules['torchvision'] = _torchvision_stub()
    if 'visualDet3D.networks.lib.ops' not in sys.modules:
        sys.modules['visualDet3D.networks.lib.ops'] = _dcn_stub()

    # the reference hardcodes .cuda() inside CPU-safe math; neutralise it
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _installed = True


def import_ref(modname: str):
    """install() + import a reference module by dotted name."""
    install()
    import importlib
    return importlib.import_module(modname)
