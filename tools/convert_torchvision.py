"""Convert a torchvision ResNet checkpoint into this framework's flax params.

The reference pulls pretrained backbones from the torchvision model zoo at
runtime (reference resnet.py:14-20). This environment has no network egress,
so conversion is offline: download the .pth elsewhere, then

  python tools/convert_torchvision.py --pth resnet34.pth --depth 34 \
      --out resnet34_flax.msgpack

Conversion maps NCHW (O, I, kh, kw) conv kernels -> HWIO, BN
(weight, bias, running_mean, running_var) -> flax (scale, bias, mean, var),
and renames layers to this package's module tree (conv1/layer{i}_{j}).
Load at train time with --pretrained_backbone=<file> (scripts/train.py) or
merge manually into the TrainState params.
"""
import argparse

import numpy as np


def convert(state_dict, depth: int, s2d: bool = False):
    """torch state_dict (numpy-converted) -> nested flax param/batch_stats."""
    from visualdet3d_tpu.models.backbones.resnet import RESNET_SPECS
    block_type, stage_blocks = RESNET_SPECS[depth]

    params = {}
    batch_stats = {}

    def put(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value

    def conv(name):
        w = state_dict[name + '.weight']  # [O, I, kh, kw]
        return {'kernel': np.transpose(w, (2, 3, 1, 0))}

    def bn(name):
        return (
            {'scale': state_dict[name + '.weight'],
             'bias': state_dict[name + '.bias']},
            {'mean': state_dict[name + '.running_mean'],
             'var': state_dict[name + '.running_var']},
        )

    # stem: conv1 + bn1 -> conv1 + BatchNorm_0
    stem = conv('conv1')
    if s2d:
        from visualdet3d_tpu.models.backbones.resnet import convert_stem_to_s2d
        stem = {'kernel': convert_stem_to_s2d(stem['kernel'])}
    put(params, ('conv1',), stem)
    p, s = bn('bn1')
    put(params, ('BatchNorm_0',), p)
    put(batch_stats, ('BatchNorm_0',), s)

    n_bn_per_block = 2 if block_type == 'basic' else 3
    for stage_idx, num_blocks in enumerate(stage_blocks):
        for block_idx in range(num_blocks):
            tname = f'layer{stage_idx + 1}.{block_idx}'
            fname = f'layer{stage_idx + 1}_{block_idx}'
            bn_i = 0
            for conv_i in range(n_bn_per_block):
                put(params, (fname, f'Conv_{conv_i}'),
                    conv(f'{tname}.conv{conv_i + 1}'))
                p, s = bn(f'{tname}.bn{conv_i + 1}')
                put(params, (fname, f'BatchNorm_{bn_i}'), p)
                put(batch_stats, (fname, f'BatchNorm_{bn_i}'), s)
                bn_i += 1
            if f'{tname}.downsample.0.weight' in state_dict:
                put(params, (fname, f'Conv_{n_bn_per_block}'),
                    conv(f'{tname}.downsample.0'))
                p, s = bn(f'{tname}.downsample.1')
                put(params, (fname, f'BatchNorm_{bn_i}'), p)
                put(batch_stats, (fname, f'BatchNorm_{bn_i}'), s)
    return {'params': params, 'batch_stats': batch_stats}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--pth', required=True)
    parser.add_argument('--depth', type=int, default=34)
    parser.add_argument('--out', required=True)
    parser.add_argument('--s2d', action='store_true',
                        help='rearrange the stem for s2d_stem backbones')
    args = parser.parse_args()

    import torch
    from flax import serialization

    sd = torch.load(args.pth, map_location='cpu')
    sd = {k: v.numpy() for k, v in sd.items() if 'fc.' not in k}
    variables = convert(sd, args.depth, s2d=args.s2d)
    with open(args.out, 'wb') as f:
        f.write(serialization.to_bytes(variables))
    print(f'wrote flax variables to {args.out}')


if __name__ == '__main__':
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
