"""Golden parity for the pretrained-weight converters.

Builds the PyTorch reference backbones (random weights + randomized BN
stats), converts their state_dicts with tools/convert_dla.py /
tools/convert_torchvision.py, and asserts the flax forward equals the torch
forward — the exact path a real zoo checkpoint takes for KM3D/MonoFlex
(reference dla.py:15-31, :328-343) and Yolo3D/Stereo3D warm-starts.

torch is imported lazily; the tests skip if it is unavailable.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

import reference_shim


def _randomize_bn(model):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)


def test_dla34_converter_forward_parity():
    dla_ref = reference_shim.import_ref('visualDet3D.networks.backbones.dla')
    torch.manual_seed(0)
    model = dla_ref.dla34(pretrained=None, out_indices=(0, 1, 2, 3, 4, 5))
    model.eval()
    _randomize_bn(model)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from convert_dla import convert
    variables = convert(sd)

    from visualdet3d_tpu.models.backbones.dla import dlanet
    net = dlanet(34)
    x = np.random.default_rng(0).standard_normal((1, 64, 96, 3)).astype(np.float32)
    out_t = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    outs_f = net.apply(variables, jnp.asarray(x), train=False)
    assert len(out_t) == len(outs_f) == 6
    for i, (a, b) in enumerate(zip(out_t, outs_f)):
        a = a.detach().numpy().transpose(0, 2, 3, 1)
        b = np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 5e-6, (i, np.abs(a - b).max(), scale)


def test_resnet34_converter_forward_parity():
    res_ref = reference_shim.import_ref('visualDet3D.networks.backbones.resnet')
    torch.manual_seed(1)
    model = res_ref.resnet(34, pretrained=False)
    model.eval()
    _randomize_bn(model)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from convert_torchvision import convert
    variables = convert(sd, 34)

    from visualdet3d_tpu.models.backbones.resnet import resnet as flax_resnet
    net = flax_resnet(depth=34, pretrained=False, frozen_stages=-1,
                      num_stages=4, out_indices=(0, 1, 2, 3), norm_eval=False,
                      dilations=(1, 1, 1, 1))
    x = np.random.default_rng(1).standard_normal((1, 64, 96, 3)).astype(np.float32)
    out_t = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    # reference resnet also returns the stride-2 stem activation first
    out_t = [a.detach().numpy().transpose(0, 2, 3, 1) for a in out_t][-4:]
    outs_f = [np.asarray(b) for b in net.apply(variables, jnp.asarray(x),
                                               train=False)]
    assert len(out_t) == len(outs_f) == 4
    for i, (a, b) in enumerate(zip(out_t, outs_f)):
        scale = np.abs(a).max() + 1e-6
        assert a.shape == b.shape, (a.shape, b.shape)
        assert np.abs(a - b).max() / scale < 5e-6, (i, np.abs(a - b).max(), scale)


def test_resnet50_converter_forward_parity():
    """Bottleneck-block path (depth > 34)."""
    res_ref = reference_shim.import_ref('visualDet3D.networks.backbones.resnet')
    torch.manual_seed(2)
    model = res_ref.resnet(50, pretrained=False)
    model.eval()
    _randomize_bn(model)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from convert_torchvision import convert
    variables = convert(sd, 50)

    from visualdet3d_tpu.models.backbones.resnet import resnet as flax_resnet
    net = flax_resnet(depth=50, pretrained=False, frozen_stages=-1,
                      num_stages=4, out_indices=(0, 1, 2, 3), norm_eval=False,
                      dilations=(1, 1, 1, 1))
    x = np.random.default_rng(2).standard_normal((1, 32, 64, 3)).astype(np.float32)
    out_t = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out_t = [a.detach().numpy().transpose(0, 2, 3, 1) for a in out_t][-4:]
    outs_f = [np.asarray(b) for b in net.apply(variables, jnp.asarray(x),
                                               train=False)]
    for i, (a, b) in enumerate(zip(out_t, outs_f)):
        scale = np.abs(a).max() + 1e-6
        assert a.shape == b.shape, (a.shape, b.shape)
        assert np.abs(a - b).max() / scale < 5e-6, (i, np.abs(a - b).max(), scale)
