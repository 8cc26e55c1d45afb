"""Convert a DLA ImageNet checkpoint (torch .pth) into flax params.

The reference pulls DLA zoo weights at runtime
(reference visualDet3D/networks/backbones/dla.py:15-31, load_pretrained_model
:328-343); this environment has no egress, so conversion is offline:

  python tools/convert_dla.py --pth dla34-ba72cf86.pth --depth 34 \
      --out dla34_flax.msgpack

Mapping (torch key -> flax path):
  base_layer.0 / .1       -> base_layer           / BatchNorm_0
  level0.0 / .1           -> level0_conv          / BatchNorm_1
  level1.0 / .1           -> level1_conv          / BatchNorm_2
  levelI.tree{1,2}...     -> levelI/tree{1,2}/... (recursive Tree topology)
  *.conv{k} / bn{k}       -> Conv_{k-1} / BatchNorm_{k-1}   (blocks)
  *.root.conv / .root.bn  -> root/Conv_0 / root/BatchNorm_0
  *.project.0 / .1        -> project_conv / BatchNorm_0     (within a Tree)

Conv kernels NCHW (O, I, kh, kw) -> HWIO. Use with KM3D/MonoFlex warm-start
via scripts/train.py --pretrained_backbone=<file>.
"""
import argparse

import numpy as np


class _TrackingDict(dict):
    """state_dict wrapper recording which tensors the converter read."""

    def __init__(self, sd):
        super().__init__(sd)
        self.read = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)


def _conv(sd, name):
    return {'kernel': np.transpose(sd[name + '.weight'], (2, 3, 1, 0))}


def _bn(sd, name):
    return ({'scale': sd[name + '.weight'], 'bias': sd[name + '.bias']},
            {'mean': sd[name + '.running_mean'],
             'var': sd[name + '.running_var']})


def _put(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _convert_block(sd, tprefix, params, stats, fpath):
    """BasicBlock conv1/bn1/conv2/bn2 (or bottleneck conv1..3) -> Conv_i."""
    i = 0
    while f'{tprefix}.conv{i + 1}.weight' in sd:
        _put(params, fpath + (f'Conv_{i}',), _conv(sd, f'{tprefix}.conv{i + 1}'))
        p, s = _bn(sd, f'{tprefix}.bn{i + 1}')
        _put(params, fpath + (f'BatchNorm_{i}',), p)
        _put(stats, fpath + (f'BatchNorm_{i}',), s)
        i += 1
    assert i in (2, 3), f'{tprefix}: unexpected block shape ({i} convs)'


def _convert_tree(sd, tprefix, params, stats, fpath):
    for child in ('tree1', 'tree2'):
        cprefix = f'{tprefix}.{child}'
        if f'{cprefix}.conv1.weight' in sd:              # leaf block
            _convert_block(sd, cprefix, params, stats, fpath + (child,))
        else:                                            # nested Tree
            _convert_tree(sd, cprefix, params, stats, fpath + (child,))
    if f'{tprefix}.root.conv.weight' in sd:
        _put(params, fpath + ('root', 'Conv_0'), _conv(sd, f'{tprefix}.root.conv'))
        p, s = _bn(sd, f'{tprefix}.root.bn')
        _put(params, fpath + ('root', 'BatchNorm_0'), p)
        _put(stats, fpath + ('root', 'BatchNorm_0'), s)
    if f'{tprefix}.project.0.weight' in sd:
        _put(params, fpath + ('project_conv',), _conv(sd, f'{tprefix}.project.0'))
        p, s = _bn(sd, f'{tprefix}.project.1')
        _put(params, fpath + ('BatchNorm_0',), p)
        _put(stats, fpath + ('BatchNorm_0',), s)


def convert(state_dict):
    """torch DLA state_dict (numpy values) -> {'params':…, 'batch_stats':…}
    matching visualdet3d_tpu.models.backbones.dla.DLA's tree."""
    sd = _TrackingDict(state_dict)
    params, stats = {}, {}
    _put(params, ('base_layer',), _conv(sd, 'base_layer.0'))
    p, s = _bn(sd, 'base_layer.1')
    _put(params, ('BatchNorm_0',), p)
    _put(stats, ('BatchNorm_0',), s)
    for i, (tkey, fkey, bn_i) in enumerate(
            [('level0', 'level0_conv', 'BatchNorm_1'),
             ('level1', 'level1_conv', 'BatchNorm_2')]):
        _put(params, (fkey,), _conv(sd, f'{tkey}.0'))
        p, s = _bn(sd, f'{tkey}.1')
        _put(params, (bn_i,), p)
        _put(stats, (bn_i,), s)
    for lvl in range(2, 6):
        # presence test by prefix, not by fixed nesting depth — DLA-60/102/169
        # have levels >= 3 at level3/4 (tree1.tree1.tree1....), which the
        # depth-probing r2 version silently skipped
        if any(k.startswith(f'level{lvl}.') for k in sd):
            _convert_tree(sd, f'level{lvl}', params, stats, (f'level{lvl}',))
    # every backbone tensor must have been READ (dangling keys mean an
    # unconverted submodule, e.g. a deeper Tree the walker missed)
    if isinstance(sd, _TrackingDict):
        leftovers = [k for k in sd
                     if k not in sd.read
                     and 'num_batches_tracked' not in k
                     and not k.startswith('fc.')]
        assert not leftovers, f'unconverted checkpoint keys: {leftovers[:8]}'
    return {'params': params, 'batch_stats': stats}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--pth', required=True)
    parser.add_argument('--out', required=True)
    args = parser.parse_args()

    import torch
    sd = torch.load(args.pth, map_location='cpu')
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    sd = {k: np.asarray(v.detach().numpy() if hasattr(v, 'detach') else v)
          for k, v in sd.items()}
    variables = convert(sd)

    from flax import serialization
    with open(args.out, 'wb') as f:
        f.write(serialization.to_bytes(variables))
    n = sum(int(np.prod(v.shape)) for v in _flat(variables['params']))
    print(f'wrote {args.out} ({n:,} params)')


def _flat(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _flat(v)
        else:
            yield v


if __name__ == '__main__':
    main()
