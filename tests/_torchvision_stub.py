"""A minimal torchvision stand-in for the reference A/B tests.

The test image lacks torchvision/timm, but ``/root/reference/model.py``
imports both at module scope and builds its towers via
``torchvision.models.densenet121/resnet18`` (reference ``model.py:75,122``).
This module provides real ``torch.nn`` implementations of those two
architectures with torchvision's EXACT child/parameter naming — so the
reference code's ``nn.Sequential(*children[:-1])`` wrapping, its
``state_dict`` key layout, and autograd training all behave identically —
just without pretrained weights (zero-egress environment; the A/B tests
share *random* weights across frameworks, which is what's under test).

Only what the reference reaches is implemented: densenet121 and resnet18
constructors + the two ``*_Weights`` enums ``model.py:5`` imports.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from collections import OrderedDict

import torch
from torch import nn


class _DenseLayer(nn.Module):
    """torchvision ``_DenseLayer``: BN-ReLU-Conv1x1(128)-BN-ReLU-Conv3x3(32)."""

    def __init__(self, in_features: int, growth: int = 32, bn_size: int = 4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_features)
        self.relu1 = nn.ReLU(inplace=False)
        self.conv1 = nn.Conv2d(in_features, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.relu2 = nn.ReLU(inplace=False)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(self.relu1(self.norm1(x)))
        return self.conv2(self.relu2(self.norm2(y)))


class _DenseBlock(nn.Module):
    def __init__(self, num_layers: int, in_features: int, growth: int = 32):
        super().__init__()
        for i in range(num_layers):
            self.add_module(
                f"denselayer{i + 1}", _DenseLayer(in_features + i * growth, growth)
            )
        self.num_layers = num_layers

    def forward(self, x):
        feats = [x]
        for i in range(self.num_layers):
            feats.append(getattr(self, f"denselayer{i + 1}")(torch.cat(feats, 1)))
        return torch.cat(feats, 1)


class _Transition(nn.Module):
    def __init__(self, in_features: int, out_features: int):
        super().__init__()
        self.norm = nn.BatchNorm2d(in_features)
        self.relu = nn.ReLU(inplace=False)
        self.conv = nn.Conv2d(in_features, out_features, 1, bias=False)
        self.pool = nn.AvgPool2d(2, 2)

    def forward(self, x):
        return self.pool(self.conv(self.relu(self.norm(x))))


class _DenseNet121(nn.Module):
    """children() order [features, classifier] like torchvision's DenseNet,
    so ``Sequential(children[:-1])`` keeps exactly the features trunk."""

    def __init__(self):
        super().__init__()
        block_config = (6, 12, 24, 16)
        feats = 64
        layers: "OrderedDict[str, nn.Module]" = OrderedDict(
            conv0=nn.Conv2d(3, feats, 7, stride=2, padding=3, bias=False),
            norm0=nn.BatchNorm2d(feats),
            relu0=nn.ReLU(inplace=False),
            pool0=nn.MaxPool2d(3, stride=2, padding=1),
        )
        for bi, n in enumerate(block_config, start=1):
            layers[f"denseblock{bi}"] = _DenseBlock(n, feats)
            feats += n * 32
            if bi < len(block_config):
                layers[f"transition{bi}"] = _Transition(feats, feats // 2)
                feats //= 2
        layers["norm5"] = nn.BatchNorm2d(feats)
        self.features = nn.Sequential(layers)
        self.classifier = nn.Linear(feats, 1000)

    def forward(self, x):  # pragma: no cover - reference wraps features only
        h = self.features(x)
        h = torch.relu(h)
        h = torch.nn.functional.adaptive_avg_pool2d(h, (1, 1)).flatten(1)
        return self.classifier(h)


class _BasicBlock(nn.Module):
    def __init__(self, in_c: int, out_c: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_c, out_c, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_c)
        self.relu = nn.ReLU(inplace=False)
        self.conv2 = nn.Conv2d(out_c, out_c, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_c)
        self.downsample = None
        if stride != 1 or in_c != out_c:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_c, out_c, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_c),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + identity)


class _ResNet18(nn.Module):
    """children() order mirrors torchvision ResNet: conv1, bn1, relu,
    maxpool, layer1-4, avgpool, fc — reference ``model.py:123`` drops fc."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=False)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        in_c = 64
        for s, (out_c, stride) in enumerate(
            ((64, 1), (128, 2), (256, 2), (512, 2)), start=1
        ):
            blocks = [_BasicBlock(in_c, out_c, stride), _BasicBlock(out_c, out_c)]
            self.add_module(f"layer{s}", nn.Sequential(*blocks))
            in_c = out_c
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, 1000)

    def forward(self, x):  # pragma: no cover - reference wraps children[:-1]
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            h = getattr(self, f"layer{s}")(h)
        return self.fc(self.avgpool(h).flatten(1))


class _Weights:
    DEFAULT = "stub"


def install() -> None:
    """Register stub ``torchvision``/``timm`` modules (idempotent; a real
    installation, if ever present, wins)."""
    if "torchvision" not in sys.modules and importlib.util.find_spec(
        "torchvision"
    ) is None:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.densenet121 = lambda *a, **k: _DenseNet121()
        tvm.resnet18 = lambda *a, **k: _ResNet18()
        tvm.DenseNet121_Weights = _Weights
        tvm.ResNet18_Weights = _Weights
        tv.models = tvm
        # transforms: constructor-only stand-ins — Hist2ST builds its bake
        # augmentation pipeline at __init__ (HIST2ST.py:130-134); the A/B
        # tests never *call* it (the forward paths under test don't augment).
        tvt = types.ModuleType("torchvision.transforms")
        for _name in (
            "Compose", "RandomGrayscale", "RandomRotation", "RandomHorizontalFlip"
        ):
            setattr(tvt, _name, type(_name, (), {"__init__": lambda self, *a, **k: None}))
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.transforms"] = tvt
    if "timm" not in sys.modules and importlib.util.find_spec("timm") is None:
        fake = types.ModuleType("timm")

        def _unavailable(*a, **k):
            raise RuntimeError("timm is not available in the test environment")

        fake.create_model = _unavailable
        sys.modules["timm"] = fake
