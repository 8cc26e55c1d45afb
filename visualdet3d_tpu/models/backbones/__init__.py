"""Backbone factory (reference networks/backbones/__init__.py:5-13)."""
from visualdet3d_tpu.models.backbones.dla import DLA, dlanet
from visualdet3d_tpu.models.backbones.resnet import ResNet, resnet
from visualdet3d_tpu.registry import BACKBONE_DICT


def build_backbone(backbone_cfg):
    """Name-dispatch: 'resnet' | 'dla' (the reference references 'vit' but
    never registers it — dead path, reference KM3D_core.py:16)."""
    cfg = dict(backbone_cfg)
    name = cfg.pop('name', 'resnet').lower()
    return BACKBONE_DICT[name if name != 'dla' else 'dlanet'](**{
        k: v for k, v in cfg.items() if k != 'pretrained'})
