"""Torch-weight import: a torch ResNet-18 built with torchvision's exact
module layout/naming produces the SAME logits through our flax model after
state-dict conversion — the pretrained-weight portability proof."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from cpu_vision_tpu import models
from cpu_vision_tpu.models.torch_weights import resnet_from_torch


class TorchBasicBlock(nn.Module):
    """torchvision resnet.BasicBlock layout (conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out)
        self.conv2 = nn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, out, 1, stride, bias=False), nn.BatchNorm2d(out)
            )
        self.relu = nn.ReLU()

    def forward(self, x):
        idt = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(y + idt)


class TorchResNet18(nn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        inp = 64
        for i, w in enumerate(widths):
            blocks = []
            for j in range(2):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(TorchBasicBlock(inp, w, stride))
                inp = w
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def test_resnet18_logits_match_torch(rng):
    torch.manual_seed(0)
    tm = TorchResNet18(num_classes=10).eval()
    # randomise BN stats so the test exercises them too
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)

    variables = resnet_from_torch(tm.state_dict(), (2, 2, 2, 2), bottleneck=False)
    ours = models.get_model("resnet18", num_classes=10)

    x = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_converted_tree_structure_matches_init(rng):
    torch.manual_seed(1)
    tm = TorchResNet18(num_classes=7)
    variables = resnet_from_torch(tm.state_dict(), (2, 2, 2, 2), bottleneck=False)
    ours = models.get_model("resnet18", num_classes=7)
    ref_vars = jax.eval_shape(
        lambda: ours.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)), train=False)
    )
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_vars)
    got_shapes = jax.tree.map(lambda a: a.shape, variables)
    assert ref_shapes == got_shapes


class TorchVGG11(nn.Module):
    """torchvision vgg11 layout (features Sequential + classifier)."""

    def __init__(self, num_classes=10):
        super().__init__()
        layers, inp = [], 3
        for v in [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(inp, v, 3, padding=1), nn.ReLU(inplace=False)]
                inp = v
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(), nn.Dropout(0.0),
            nn.Linear(4096, 4096), nn.ReLU(), nn.Dropout(0.0),
            nn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = torch.flatten(x, 1)
        return self.classifier(x)


def test_vgg11_logits_match_torch(rng):
    from cpu_vision_tpu.models.torch_weights import vgg_from_torch

    torch.manual_seed(2)
    tm = TorchVGG11(num_classes=6).eval()
    variables = vgg_from_torch(tm.state_dict())
    ours = models.get_model("vgg11", num_classes=6)
    x = rng.random((1, 224, 224, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=1e-3)


def test_flatten_order_conversion_sharp(rng):
    """A conv+linear net at a spatial size where activations VARY by
    position — catches CHW/HWC flatten-order bugs the big nets mask."""
    from cpu_vision_tpu.models.torch_weights import sequential_cnn_from_torch
    from flax import linen as fnn

    class TorchTiny(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.ReLU())
            self.classifier = nn.Sequential(nn.Linear(4 * 4 * 4, 5))

        def forward(self, x):
            return self.classifier(torch.flatten(self.features(x), 1))

    class FlaxTiny(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            x = fnn.relu(fnn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)])(x))
            x = x.reshape(x.shape[0], -1)
            return fnn.Dense(5)(x)

    torch.manual_seed(3)
    tm = TorchTiny().eval()
    variables = sequential_cnn_from_torch(tm.state_dict())
    x = rng.random((2, 4, 4, 3), dtype=np.float32)  # tiny: positions matter
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(FlaxTiny().apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)
