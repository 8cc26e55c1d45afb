"""KM3D and MonoFlex: center-based monocular 3D detection.

reference: visualDet3D/networks/detectors/KM3D.py:17-98 (detector) and
KM3D_core.py:10-59 (DLA + DLASegUpsample vs. ResNet + deconv upsampling to
stride 4). TPU-first: flax modules + pure jitted loss/decode with fixed
max_objects / top-K shapes.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from visualdet3d_tpu.models.backbones.dla import dlanet
from visualdet3d_tpu.models.backbones.dla_utils import DLASegUpsample
from visualdet3d_tpu.models.backbones.resnet import resnet
from visualdet3d_tpu.models.heads import km3d_head as km3d_lib
from visualdet3d_tpu.models.heads import monoflex_head as monoflex_lib
from visualdet3d_tpu.models.quant import Int8InferenceMixin
from visualdet3d_tpu.registry import DETECTOR_DICT


class KM3DCore(nn.Module):
    """Backbone + upsampling to stride 4 (reference KM3D_core.py:10-59)."""
    backbone_cfg: FrozenDict

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = dict(self.backbone_cfg)
        name = cfg.pop('name', 'dla').lower()
        if name == 'dla':
            feats = dlanet(**cfg)(images, train=train)
            x = DLASegUpsample(
                input_channels=(16, 32, 64, 128, 256, 512), down_ratio=4,
                last_level=5, out_channel=64)(feats, train=train)
        elif name == 'resnet':
            feats = resnet(**cfg)(images, train=train)
            x = feats[-1]
            for _ in range(3):  # deconv chain back to stride 4
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), 'bilinear')
                x = nn.Conv(256, (3, 3), padding='SAME', use_bias=False,
                            kernel_init=nn.initializers.normal(0.001))(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
                x = nn.relu(x)
        else:
            raise NotImplementedError(name)
        return x


class KM3DNet(nn.Module):
    backbone_cfg: FrozenDict
    head_dict: Tuple[Tuple[str, int], ...]
    head_features: int = 64

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = KM3DCore(self.backbone_cfg)(images, train=train)
        return km3d_lib.KM3DHeadNet(self.head_dict, self.head_features)(x)


@DETECTOR_DICT.register_module
class KM3D(Int8InferenceMixin):
    """reference KM3D.py:17 (KM3D)."""

    decode_fn = staticmethod(km3d_lib.km3d_decode)
    default_head_dict = km3d_lib.DEFAULT_HEAD_DICT

    # int8 (models/quant.py): the DCN offset convs (27 ch) and every final
    # prediction conv (<= 24 ch) fall below the 64-channel selection bound,
    # so only the DLA trunk's stride-1 convs and the 64-ch head conv1
    # towers quantize; nothing needs an explicit deny entry.
    int8_deny: tuple = ()

    def __init__(self, network_cfg):
        self.cfg = network_cfg
        self.obj_types = list(network_cfg.obj_types)
        head_cfg = network_cfg.head
        layer_cfg = dict(head_cfg.get('layer_cfg', {}))
        head_dict = dict(layer_cfg.get('head_dict', self.default_head_dict))
        head_dict['hm'] = len(self.obj_types)
        self.head_dict = tuple(sorted(head_dict.items()))
        self.loss_cfg = head_cfg.get('loss_cfg', {})
        self.test_cfg = head_cfg.get('test_cfg', {})
        self.net = KM3DNet(
            backbone_cfg=FrozenDict(dict(network_cfg.backbone)),
            head_dict=self.head_dict,
            head_features=layer_cfg.get('head_features', 64))

    def init(self, rng, image_hw: Tuple[int, int], batch_size: int = 1):
        images = jnp.zeros((batch_size, image_hw[0], image_hw[1], 3), jnp.float32)
        return self.net.init({'params': rng}, images, train=True)

    def fold_inference_variables(self, variables, image_hw: Tuple[int, int],
                                 batch_size: int = 1):
        """Fold conv+BN for the jitted predict path (models/fold_bn.py)."""
        import jax as _jax
        from visualdet3d_tpu.models.fold_bn import fold_batchnorm
        img = _jax.ShapeDtypeStruct((batch_size, *image_hw, 3), jnp.float32)
        return fold_batchnorm(
            variables, lambda v, im: self.net.apply(v, im, train=False), img)

    def _eval_apply(self, variables, *inputs):
        return self.net.apply(variables, *inputs, train=False)

    def _int8_trace_args(self, image_hw, batch_size: int = 1):
        img = jax.ShapeDtypeStruct((batch_size, *image_hw, 3), jnp.float32)
        return (img,)

    def int8_calib_inputs(self, batch):
        return (batch['images'],)

    def loss(self, variables, images, gts, P2, rng=None, train: bool = True,
             epoch: float = 100.0):
        """batch keys follow the RTM3D target dict; returns
        ((loss, loss_dict), new_state) — reference train_rtm3d contract."""
        rngs = {'dropout': rng} if rng is not None else {}
        output, new_state = self.net.apply(
            variables, images, train=train, rngs=rngs,
            mutable=['batch_stats'] if train else [])
        # loss math is always f32 (mixed-precision mode emits bf16 heads —
        # pipelines/train_state.py _mixed_precision_interceptor)
        output = jax.tree.map(lambda x: x.astype(jnp.float32), output)
        output_w = images.shape[2] // 4
        loss, loss_dict = km3d_lib.km3d_loss(
            output, gts, P2, jnp.asarray(epoch, jnp.float32), output_w,
            rampup_length=self.loss_cfg.get('rampup_length', 100))
        return (loss, loss_dict), new_state

    def predict(self, variables, images, P2, max_detections: int = 32):
        dtype = self.cfg.get('inference_dtype', 'float32')
        variables, (images,), ctx = self._inference_cast(variables, [images])
        with ctx:
            output = self.net.apply(variables, images, train=False)
        if dtype != 'float32':
            # decode in f32 (heatmap topk + LSQ position solve)
            output = {k: v.astype(jnp.float32) for k, v in output.items()}
        image_hw = (images.shape[1], images.shape[2])
        kwargs = dict(
            score_thr=self.test_cfg.get('score_thr', 0.1),
            nms_iou_thr=self.test_cfg.get('nms_iou_thr', 0.5),
            top_k=self.test_cfg.get('top_k', 100),
            max_detections=max_detections,
            cls_agnostic=self.test_cfg.get('cls_agnositc', True))
        # heatmap decode operates on stride-4 maps; P2 passed at input scale.
        # The decoders are single-image (reference test_mono_detection runs
        # batch 1); vmap them for batched inference.
        if images.shape[0] == 1:
            out = self.decode_fn(output, P2, image_hw, **kwargs)
            for k in ('scores', 'bboxes', 'labels', 'valid'):
                out[k] = out[k][None]  # add batch dim for the tester protocol
            return out
        return jax.vmap(
            lambda out_i, p_i: self.decode_fn(
                {k: v[None] for k, v in out_i.items()}, p_i[None],
                image_hw, **kwargs)
        )(output, P2)


@DETECTOR_DICT.register_module
class MonoFlex(KM3D):
    """reference KM3D.py:91 (MonoFlex)."""

    decode_fn = staticmethod(monoflex_lib.monoflex_decode)
    default_head_dict = monoflex_lib.MONOFLEX_HEAD_DICT

    def loss(self, variables, images, gts, P2, rng=None, train: bool = True,
             epoch: float = 100.0):
        rngs = {'dropout': rng} if rng is not None else {}
        output, new_state = self.net.apply(
            variables, images, train=train, rngs=rngs,
            mutable=['batch_stats'] if train else [])
        output = jax.tree.map(lambda x: x.astype(jnp.float32), output)
        loss, loss_dict = monoflex_lib.monoflex_loss(
            output, gts, P2, epoch,
            uncertainty_range=tuple(self.loss_cfg.get('uncertainty_range',
                                                      (-10.0, 10.0))),
            uncertainty_weight=self.loss_cfg.get('uncertainty_weight', 1.0))
        return (loss, loss_dict), new_state
