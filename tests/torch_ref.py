"""PyTorch twins of the two reference architectures — PARITY FIXTURES ONLY.

These modules exist so tests can (a) produce eval-mode golden outputs to
compare the Flax models against, and (b) produce/consume state_dicts in the
reference's exact key schema (conv_layers.N.*, fc_layers.N.*,
{bleed,source}_branch.conv_blocks.N.*, regression_head.fc_layers.N.* — see
reference regression_model.py:5-61 and two_branch_regression.py:5-100 for the
architecture these reproduce). They are not part of the framework.
"""

import torch
from torch import nn


def _conv_block(cin: int, cout: int):
    return [
        nn.Conv2d(cin, cout, kernel_size=3, stride=1, padding=1),
        nn.BatchNorm2d(cout),
        nn.LeakyReLU(0.01),
        nn.MaxPool2d(2, 2),
    ]


def _head_layers(flat: int, dropout: float):
    return [
        nn.Flatten(),
        nn.Linear(flat, 512),
        nn.BatchNorm1d(512),
        nn.LeakyReLU(0.01),
        nn.Dropout(dropout),
        nn.Linear(512, 128),
        nn.BatchNorm1d(128),
        nn.LeakyReLU(0.01),
        nn.Dropout(dropout),
        nn.Linear(128, 1),
    ]


class TorchSingle(nn.Module):
    """Key schema: conv_layers.{4k,4k+1}.*, fc_layers.{1,2,5,6,9}.*"""

    def __init__(self, input_channels=2, initial_filters=128, num_blocks=6,
                 image_size=256, max_filters=512):
        super().__init__()
        layers = []
        cin, cout = input_channels, initial_filters
        layers += _conv_block(cin, cout)
        for _ in range(1, num_blocks):
            cin, cout = cout, min(cout * 2, max_filters)
            layers += _conv_block(cin, cout)
        self.conv_layers = nn.Sequential(*layers)
        side = image_size >> num_blocks
        self.fc_layers = nn.Sequential(*_head_layers(cout * side * side, 0.1))

    def forward(self, x):
        return self.fc_layers(self.conv_layers(x))


class _Branch(nn.Module):
    def __init__(self, filters: int):
        super().__init__()
        blocks = []
        cin = 1
        for mult in (1, 2, 4, 8):
            blocks += _conv_block(cin, filters * mult)
            cin = filters * mult
        self.conv_blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.conv_blocks(x)


class _Head(nn.Module):
    def __init__(self, flat: int):
        super().__init__()
        self.fc_layers = nn.Sequential(*_head_layers(flat, 0.5), nn.Sigmoid())

    def forward(self, x):
        return self.fc_layers(x)


class TorchDouble(nn.Module):
    """Key schema: {bleed,source}_branch.conv_blocks.*, regression_head.fc_layers.*"""

    def __init__(self, filters_per_branch=64, image_size=256):
        super().__init__()
        self.bleed_branch = _Branch(filters_per_branch)
        self.source_branch = _Branch(filters_per_branch)
        side = image_size >> 4
        flat = 2 * filters_per_branch * 8 * side * side
        self.regression_head = _Head(flat)

    def forward(self, x):
        fused = torch.cat(
            [self.bleed_branch(x[:, 0:1]), self.source_branch(x[:, 1:2])], dim=1
        )
        return self.regression_head(fused) * 0.5


def burn_in_batch_stats(model: nn.Module, image_size: int, steps: int = 3, seed: int = 0):
    """Run a few train-mode forwards so running_mean/var move off init —
    otherwise BN-stat conversion bugs would be invisible in eval mode."""
    torch.manual_seed(seed)
    model.train()
    with torch.no_grad():
        for _ in range(steps):
            model(torch.randn(4, 2, image_size, image_size))
    model.eval()
    return model
