"""Test-only stand-in for the torchvision symbols the reference VGG loss
imports (`dl_cs/utils/VGGloss.py`, `vgg_preceptual_loss.py`): `models.vgg16`
and `models.feature_extraction.create_feature_extractor`.

torchvision is absent from this image (and its pretrained weights are
unreachable — zero egress), so the shimmed vgg16 builds the standard VGG16
`features` stack with random weights. `vgg16()` returns a process-wide
singleton so that a parity test can read the exact weights the reference
loss object uses. NOT shipped code — tests only.
"""

import sys
import types

import torch
from torch import nn

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]

_SINGLETON = None


class _VGG(nn.Module):
    def __init__(self):
        super().__init__()
        layers = []
        in_c = 3
        for v in VGG16_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers.append(nn.Conv2d(in_c, v, kernel_size=3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                in_c = v
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


def vgg16(pretrained=False, weights=None, **kw):
    global _SINGLETON
    if _SINGLETON is None:
        _SINGLETON = _VGG()
    return _SINGLETON


class _Extractor(nn.Module):
    """Minimal create_feature_extractor: run `features` sequentially,
    collect the requested `features.<i>` outputs into a dict."""

    def __init__(self, model, return_nodes):
        super().__init__()
        self.features = model.features
        self.nodes = {}  # layer index -> output name
        for node, name in return_nodes.items():
            assert node.startswith("features.")
            self.nodes[int(node.split(".")[1])] = name

    def forward(self, x):
        out = {}
        last = max(self.nodes)
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.nodes:
                out[self.nodes[i]] = x
            if i == last:
                break
        return out


def create_feature_extractor(model, return_nodes):
    return _Extractor(model, return_nodes)


def install():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    fx = types.ModuleType("torchvision.models.feature_extraction")
    models.vgg16 = vgg16
    fx.create_feature_extractor = create_feature_extractor
    tv.models = models
    models.feature_extraction = fx
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.feature_extraction"] = fx
