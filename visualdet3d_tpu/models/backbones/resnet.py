"""ResNet backbone family (flax.linen, NHWC), torchvision-compatible topology.

Mirrors the reference's configurable ResNet
(visualDet3D/networks/backbones/resnet.py:95-270): depth in {18, 34, 50, 101,
152}, ``num_stages``/``out_indices`` to truncate and tap intermediate stages,
``dilations`` per stage, ``frozen_stages`` (implemented TPU-natively as
stop_gradient on the stage boundary — a prefix freeze, exactly the reference
semantics of not updating those parameters), and ``norm_eval`` (BatchNorm in
inference mode during training, reference resnet.py:154-182).

Weights can be converted from torchvision checkpoints with
tools/convert_torchvision.py (URLs in reference resnet.py:14-20 are not
fetchable here: zero egress).
"""
from __future__ import annotations

from typing import Sequence

import jax
from flax import linen as nn

from visualdet3d_tpu.registry import BACKBONE_DICT

RESNET_SPECS = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


def _bn(train: bool, norm_eval: bool):
    use_running = (not train) or norm_eval
    return nn.BatchNorm(use_running_average=use_running, momentum=0.9, epsilon=1e-5)


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (reference resnet.py:23-53)."""
    features: int
    stride: int = 1
    dilation: int = 1
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        # explicit symmetric padding == torch Conv2d(padding=dilation): for
        # stride 1 this equals 'SAME', but for stride 2 XLA 'SAME' pads
        # (0, 1) while torch pads (1, 1) — a 1px sampling-grid shift that
        # breaks pretrained-weight parity
        pad = [(self.dilation, self.dilation)] * 2
        out = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=pad, use_bias=False)(x)
        out = _bn(train, self.norm_eval)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding='SAME', use_bias=False)(out)
        out = _bn(train, self.norm_eval)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False)(x)
            identity = _bn(train, self.norm_eval)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) bottleneck (reference resnet.py:55-93)."""
    features: int  # bottleneck width; output is features * 4
    stride: int = 1
    dilation: int = 1
    norm_eval: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_features = self.features * self.expansion
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        out = _bn(train, self.norm_eval)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=[(self.dilation, self.dilation)] * 2,  # torch parity (see BasicBlock)
                      use_bias=False)(out)
        out = _bn(train, self.norm_eval)(out)
        out = nn.relu(out)
        out = nn.Conv(out_features, (1, 1), use_bias=False)(out)
        out = _bn(train, self.norm_eval)(out)
        if self.stride != 1 or x.shape[-1] != out_features:
            identity = nn.Conv(out_features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False)(x)
            identity = _bn(train, self.norm_eval)(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Multi-stage ResNet trunk returning the stages in ``out_indices``.

    Output channels per stage: basic (64, 128, 256, 512);
    bottleneck (256, 512, 1024, 2048). Strides 4, 8, 16, 32.
    """
    depth: int = 101
    num_stages: int = 4
    out_indices: Sequence[int] = (3,)
    frozen_stages: int = -1
    dilations: Sequence[int] = (1, 1, 1, 1)
    norm_eval: bool = False
    pretrained: bool = True  # kept for config parity; loading is external
    s2d_stem: bool = False  # space-to-depth stem (TPU MXU utilisation)
    remat: bool = False  # per-block rematerialisation (activation memory)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_type, stage_blocks = RESNET_SPECS[self.depth]
        block_cls = BasicBlock if block_type == 'basic' else Bottleneck
        if self.remat:
            # recompute each residual block in the backward pass instead of
            # saving its activations: trades ~1 extra forward of FLOPs for
            # O(num_blocks) less activation memory (enables batch-8 f32
            # stereo training at 288x1280 on a single 16 GB chip)
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        stage_blocks = stage_blocks[:self.num_stages]

        if self.s2d_stem:
            # A 7x7/s2 conv on 3 channels uses 3/128 of the MXU's contraction
            # lanes. Space-to-depth by 2 turns it into an exactly-equivalent
            # (slightly more expressive: 4x4x12 >= padded 7x7x3) 4x4/s1 conv
            # on 12 channels — ~4x stem throughput. Pretrained 7x7 kernels
            # convert losslessly (tools/convert_torchvision.py --s2d).
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
            x = nn.Conv(64, (4, 4), strides=(1, 1), padding=[(2, 1), (2, 1)],
                        use_bias=False, name='conv1')(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, name='conv1')(x)
        x = _bn(train, self.norm_eval)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        features = 64
        for stage_idx, num_blocks in enumerate(stage_blocks):
            stride = 1 if stage_idx == 0 else 2
            dilation = self.dilations[stage_idx] if stage_idx < len(self.dilations) else 1
            if dilation > 1:
                stride = 1
            for block_idx in range(num_blocks):
                x = block_cls(features=features,
                              stride=stride if block_idx == 0 else 1,
                              dilation=dilation,
                              norm_eval=self.norm_eval,
                              name=f'layer{stage_idx + 1}_{block_idx}')(x, train)
            if self.frozen_stages >= stage_idx + 1:
                x = jax.lax.stop_gradient(x)
            if stage_idx in self.out_indices:
                outs.append(x)
            features *= 2
        return outs


def convert_stem_to_s2d(w7: 'jnp.ndarray'):
    """Losslessly rearrange a [7, 7, C, O] stride-2 stem kernel into the
    equivalent [4, 4, 4C, O] space-to-depth kernel.

    Derivation: y[i] = sum_a w7[a] x[2i + a - 3]; with 2x2 blocks
    t[u, (p, c)] = x[2u + p], tap (dj, p) reads a = 2*dj + p - 1
    (dj in 0..3 maps to block offset dj - 2 under padding (2, 1)).
    """
    import numpy as np
    w7 = np.asarray(w7)
    kh, kw, c, o = w7.shape
    assert (kh, kw) == (7, 7)
    w4 = np.zeros((4, 4, 4 * c, o), w7.dtype)
    for dj in range(4):
        for p in range(2):
            a = 2 * dj + p - 1
            if not 0 <= a < 7:
                continue
            for dk in range(4):
                for q in range(2):
                    b = 2 * dk + q - 1
                    if not 0 <= b < 7:
                        continue
                    w4[dj, dk, (p * 2 + q) * c:(p * 2 + q + 1) * c] = w7[a, b]
    return w4


@BACKBONE_DICT.register_module
def resnet(**kwargs) -> ResNet:
    """Factory matching the reference's keyword API (resnet.py:255-270)."""
    kwargs.pop('pretrained', None)
    num_stages = kwargs.get('num_stages', 4)
    kwargs.setdefault('dilations', tuple([1] * num_stages))
    valid = {'depth', 'num_stages', 'out_indices', 'frozen_stages',
             'dilations', 'norm_eval', 's2d_stem', 'remat'}
    kwargs = {k: v for k, v in kwargs.items() if k in valid}
    if 'out_indices' in kwargs:
        kwargs['out_indices'] = tuple(kwargs['out_indices'])
    if 'dilations' in kwargs:
        kwargs['dilations'] = tuple(kwargs['dilations'])
    return ResNet(**kwargs)
