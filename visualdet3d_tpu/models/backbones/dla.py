"""Deep Layer Aggregation backbone (flax.linen, NHWC).

reference: visualDet3D/networks/backbones/dla.py:156-440 — recursive
Tree/Root topology, 6 levels out (strides 1,1,2,4,8,16,32), configurable via
``dlanet(depth)``. DLA-34 uses levels (1,1,1,2,2,1) and channels
(16,32,64,128,256,512) with basic blocks.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from visualdet3d_tpu.registry import BACKBONE_DICT

DLA_SPECS = {
    34: ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512), 'basic'),
    46: ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256), 'bottleneck'),
    60: ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), 'bottleneck'),
    102: ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), 'bottleneck'),
    169: ((1, 1, 2, 3, 5, 1), (16, 32, 128, 256, 512, 1024), 'bottleneck'),
}


def _bn(train: bool):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)


class DLABasicBlock(nn.Module):
    """3x3 conv pair with external residual input (reference dla.py:96-126)."""
    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        # explicit symmetric padding == torch Conv2d(padding=dilation): XLA
        # 'SAME' pads (0, 1) for stride 2, torch pads (1, 1) — must match
        # for pretrained-weight parity (tools/convert_dla.py)
        pad = [(self.dilation, self.dilation)] * 2
        out = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=pad, use_bias=False)(x)
        out = _bn(train)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=pad,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False)(out)
        out = _bn(train)(out)
        return nn.relu(out + residual)


class DLABottleneck(nn.Module):
    """Bottleneck variant (reference dla.py:128-154)."""
    features: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 2

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.features // self.expansion
        out = nn.Conv(bottle, (1, 1), use_bias=False)(x)
        out = _bn(train)(out)
        out = nn.relu(out)
        out = nn.Conv(bottle, (3, 3), strides=(self.stride, self.stride),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=[(self.dilation, self.dilation)] * 2,  # torch parity
                      use_bias=False)(out)
        out = _bn(train)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (1, 1), use_bias=False)(out)
        out = _bn(train)(out)
        return nn.relu(out + residual)


class Root(nn.Module):
    """Aggregate children features (reference dla.py:156-175)."""
    features: int
    kernel_size: int = 1
    residual: bool = False

    @nn.compact
    def __call__(self, children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    padding='SAME', use_bias=False)(x)
        x = _bn(train)(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive aggregation tree (reference dla.py:177-231)."""
    levels: int
    features: int
    block: str = 'basic'
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_kernel_size: int = 1
    dilation: int = 1
    root_residual: bool = False

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        block_cls = DLABasicBlock if self.block == 'basic' else DLABottleneck
        root_dim = self.root_dim or 2 * self.features
        if self.level_root:
            root_dim += x.shape[-1]

        children = [] if children is None else list(children)
        bottom = nn.max_pool(x, (self.stride, self.stride),
                             (self.stride, self.stride)) if self.stride > 1 else x
        # torch Tree.forward (reference dla.py:217-220) ALWAYS recomputes
        # residual = project(bottom) at its own level and discards any
        # caller-passed residual — nested trees never inherit the outer one
        if x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), use_bias=False,
                               name='project_conv')(bottom)
            residual = _bn(train)(residual)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = block_cls(self.features, self.stride, self.dilation,
                           name='tree1')(x, residual, train=train)
            x2 = block_cls(self.features, 1, self.dilation,
                           name='tree2')(x1, train=train)
            out = Root(self.features, self.root_kernel_size, self.root_residual,
                       name='root')([x2, x1] + children, train=train)
        else:
            x1 = Tree(self.levels - 1, self.features, self.block, self.stride,
                      root_dim=0, root_kernel_size=self.root_kernel_size,
                      dilation=self.dilation, root_residual=self.root_residual,
                      name='tree1')(x, train=train)
            children.append(x1)
            out = Tree(self.levels - 1, self.features, self.block, 1,
                       root_dim=root_dim + self.features,
                       root_kernel_size=self.root_kernel_size,
                       dilation=self.dilation, root_residual=self.root_residual,
                       name='tree2')(x1, children=children, train=train)
        return out


class DLA(nn.Module):
    """Full DLA trunk returning all 6 levels (reference dla.py:233-326)."""
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    block: str = 'basic'
    residual_root: bool = False
    out_indices: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = list(self.channels)
        x = nn.Conv(ch[0], (7, 7), padding='SAME', use_bias=False,
                    name='base_layer')(x)
        x = _bn(train)(x)
        x = nn.relu(x)

        outs = []
        # level0: plain conv stage, stride 1
        y = nn.Conv(ch[0], (3, 3), padding='SAME', use_bias=False,
                    name='level0_conv')(x)
        y = _bn(train)(y)
        y = nn.relu(y)
        outs.append(y)
        # level1: plain conv stage, stride 2 (explicit (1,1) pad: torch parity)
        y = nn.Conv(ch[1], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, name='level1_conv')(y)
        y = _bn(train)(y)
        y = nn.relu(y)
        outs.append(y)
        # levels 2..5: aggregation trees
        y = Tree(self.levels[2], ch[2], self.block, 2, level_root=False,
                 root_residual=self.residual_root, name='level2')(y, train=train)
        outs.append(y)
        y = Tree(self.levels[3], ch[3], self.block, 2, level_root=True,
                 root_residual=self.residual_root, name='level3')(y, train=train)
        outs.append(y)
        y = Tree(self.levels[4], ch[4], self.block, 2, level_root=True,
                 root_residual=self.residual_root, name='level4')(y, train=train)
        outs.append(y)
        y = Tree(self.levels[5], ch[5], self.block, 2, level_root=True,
                 root_residual=self.residual_root, name='level5')(y, train=train)
        outs.append(y)
        return [outs[i] for i in self.out_indices]


@BACKBONE_DICT.register_module
def dlanet(depth: int = 34, **kwargs) -> DLA:
    """Factory matching the reference keyword API (dla.py:428-440)."""
    levels, channels, block = DLA_SPECS[depth]
    kwargs = {k: v for k, v in kwargs.items() if k in ('out_indices', 'residual_root')}
    if 'out_indices' in kwargs:
        kwargs['out_indices'] = tuple(kwargs['out_indices'])
    return DLA(levels=levels, channels=channels, block=block, **kwargs)
