"""DLA upsampling neck with deformable convolutions (IDAUp / DLAUp).

reference: visualDet3D/networks/backbones/dla_utils.py:42-180 — every
aggregation node is a modulated deformable conv; the per-channel transposed
conv is initialised to exact bilinear interpolation (fill_up_weights,
:29-38). TPU-native choice: the upsample is jax.image.resize bilinear (the
function the reference initialises to); the learnable capacity lives in the
deformable project/node convs, which dominate the block.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from visualdet3d_tpu.models.blocks import ModulatedDeformConv


class DeformConvBlock(nn.Module):
    """DCN + BN + ReLU node (reference dla_utils.py:42-56)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ModulatedDeformConv(self.features, 3)(x, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


def _bilinear_up(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), 'bilinear')


class IDAUp(nn.Module):
    """Iterative deep aggregation over a list of feature maps
    (reference dla_utils.py:59-86)."""
    out_features: int
    up_factors: Sequence[int]

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], startp: int, endp: int,
                 train: bool = False):
        layers = list(layers)
        for i in range(startp + 1, endp):
            j = i - startp
            x = DeformConvBlock(self.out_features, name=f'proj_{j}')(
                layers[i], train=train)
            x = _bilinear_up(x, int(self.up_factors[j]))
            x = DeformConvBlock(self.out_features, name=f'node_{j}')(
                x + layers[i - 1], train=train)
            layers[i] = x
        return layers


class DLAUp(nn.Module):
    """Pyramid of IDAUp merges (reference dla_utils.py:89-123)."""
    startp: int
    channels: Sequence[int]
    scales: Sequence[int]

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        """layers: the FULL level list; only indices >= startp participate
        (matching the reference's absolute indexing, dla_utils.py:110-116)."""
        layers = list(layers)
        channels = list(self.channels)  # channels of levels[startp:]
        scales = np.array(self.scales, int)
        out = [layers[-1]]
        for i in range(len(layers) - self.startp - 1):
            j = -i - 2
            ida = IDAUp(channels[j], (scales[j:] // scales[j]).tolist(),
                        name=f'ida_{i}')
            layers = ida(layers, len(layers) - i - 2, len(layers), train=train)
            out.insert(0, layers[-1])
            scales[j + 1:] = scales[j]
        return out


class DLASegUpsample(nn.Module):
    """DLAUp + final IDAUp -> stride-``down_ratio`` feature map
    (reference dla_utils.py:126-180)."""
    input_channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    down_ratio: int = 4
    last_level: int = 5
    out_channel: int = 64

    @nn.compact
    def __call__(self, tensors: List[jnp.ndarray], train: bool = False):
        first_level = int(np.log2(self.down_ratio))
        channels = list(self.input_channels)
        scales = [2 ** i for i in range(len(channels[first_level:]))]
        outs = DLAUp(first_level, channels[first_level:], scales,
                     name='dla_up')(list(tensors), train=train)

        out_channel = self.out_channel or channels[first_level]
        y = [outs[i] for i in range(self.last_level - first_level)]
        y = IDAUp(out_channel, [2 ** i for i in range(self.last_level - first_level)],
                  name='ida_up')(y, 0, len(y), train=train)
        return y[-1]
