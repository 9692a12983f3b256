"""Export pretrained LPIPS(VGG16) weights to the npz layout
`sings_tpu.losses.lpips.load_weights` consumes.

This environment has no network egress and no cached torchvision/lpips
checkpoints, so the *pretrained* export must run wherever those
packages exist (any machine with `pip install lpips torchvision`):

    python scripts/export_lpips_weights.py lpips_vgg.npz

then point `tpu.lpips_weights: /path/lpips_vgg.npz` in the train config.

The conversion core (`convert_state`) is pure tensor bookkeeping and is
exercised in-repo by tests/test_fields_losses.py with RANDOM torch-side
weights: torch reference forward == sings_tpu.losses.lpips forward
byte-exact through the npz round trip, proving the plumbing so the real
npz produced out-of-band is metric-grade (reference uses lpips-VGG as
loss and val metric, sings/rec/losses/loss.py:34,
sings/rec/trainer/gs_trainer.py:198,586).
"""
from __future__ import annotations

import sys

import numpy as np

# VGG16 `features` indices of the 13 conv layers (torchvision layout)
TORCH_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_state(conv_weights, conv_biases, lin_weights) -> dict:
    """torch tensors -> npz dict in load_weights() layout.

    conv_weights[i]: (cout, cin, 3, 3) -> conv{i}_w (3, 3, cin, cout)
    conv_biases[i]:  (cout,)           -> conv{i}_b
    lin_weights[j]:  (1, c, 1, 1) lpips NetLinLayer 1x1 conv -> lin{j}_w (c,)
    """
    out = {}
    for i, (w, b) in enumerate(zip(conv_weights, conv_biases)):
        w = np.asarray(w, np.float32)
        assert w.ndim == 4 and w.shape[2:] == (3, 3), w.shape
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv{i}_b"] = np.asarray(b, np.float32)
    for j, lw in enumerate(lin_weights):
        out[f"lin{j}_w"] = np.asarray(lw, np.float32).reshape(-1)
    assert len(lin_weights) == 5
    return out


def export_from_lpips_package(path: str) -> None:
    """Requires `lpips` + `torchvision` (not present in this image)."""
    import lpips as lpips_pkg  # noqa: deferred heavy import
    import torch

    net = lpips_pkg.LPIPS(net="vgg", spatial=False)
    vgg = net.net  # lpips.pretrained_networks.vgg16 wrapper
    # the wrapper stores torchvision vgg16(pretrained).features in
    # slices; re-walk the flat features module for stable ordering
    feats = torch.nn.Sequential(
        *vgg.slice1, *vgg.slice2, *vgg.slice3, *vgg.slice4, *vgg.slice5
    )
    convs = [m for m in feats if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 13, len(convs)
    lin_ws = []
    for lin in net.lins:
        conv1x1 = [m for m in lin.model if isinstance(m, torch.nn.Conv2d)]
        assert len(conv1x1) == 1
        lin_ws.append(conv1x1[0].weight.detach())
    out = convert_state(
        [c.weight.detach() for c in convs],
        [c.bias.detach() for c in convs],
        lin_ws,
    )
    np.savez(path, **out)
    print(f"wrote {path}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    export_from_lpips_package(sys.argv[1] if len(sys.argv) > 1
                              else "lpips_vgg.npz")
