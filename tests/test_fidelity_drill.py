"""Parity-readiness drill on SERIALIZED checkpoints (VERDICT r1 next#4).

The released arch0/1/2 ``.ckpt`` files are absent (reference mount
empty, SURVEY.md §0). This drill exercises, from real files, the exact
code that must work the day the artifacts land:

  torch.save a full twin segmenter (tonylins MBV2 trunk + genotype
  decoder, ``state_dict`` wrapping + ``module.`` prefixes, the released
  checkpoints' packaging) -> load_segmenter_checkpoint /
  load_mbv2_checkpoint from disk -> torch-exported golden ``.npz`` ->
  ``segtpu fidelity --golden ... --max-dlogit`` end-to-end through the
  CLI.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from segtpu.models.arch_literals import ARCHS
from segtpu.models.encoders import MBV2_TAP_CHANNELS
from test_convert import build_torch_mbv2_trunk, MBV2_TAP_IDX
from test_parity_torch_twin import TorchMicroDecoder


class TorchSegmenter(nn.Module):
    """Full twin: registration order (features then decoder) matches the
    segtpu segmenter template traversal ({'encoder':…, 'decoder':…}), so
    the order-based converter lines the state_dict stream up exactly."""

    def __init__(self, genotype, num_classes):
        super().__init__()
        self.features = build_torch_mbv2_trunk()
        self.decoder = TorchMicroDecoder(genotype, MBV2_TAP_CHANNELS,
                                         num_classes)

    def forward(self, x):
        taps = []
        for i, m in enumerate(self.features):
            x = m(x)
            if i in MBV2_TAP_IDX:
                taps.append(x)
        return self.decoder(taps)


def _randomize_bn(model, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.2)


def _released_style_ckpt(model, path):
    """Package like a released checkpoint: {'state_dict': {'module.'+k}}."""
    sd = {"module." + k: v for k, v in model.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    torch.save({"state_dict": sd, "epoch": 123}, path)


def test_load_mbv2_checkpoint_from_file(tmp_path):
    """The serialized-encoder path (state_dict unwrap + module. strip)
    must equal the in-memory name-based conversion."""
    from segtpu.convert.torch_import import (load_mbv2_checkpoint,
                                             load_mbv2_state_dict)
    torch.manual_seed(3)
    trunk = build_torch_mbv2_trunk().eval()
    sd = {f"features.{k}": v for k, v in trunk.state_dict().items()}
    path = str(tmp_path / "mbv2.ckpt")
    torch.save({"state_dict": {"module." + k: v for k, v in sd.items()}},
               path)
    from_file = load_mbv2_checkpoint(path)
    in_memory = load_mbv2_state_dict(sd)
    for a, b in zip(jax.tree_util.tree_leaves(from_file),
                    jax.tree_util.tree_leaves(in_memory)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fidelity_cli_end_to_end_from_files(tmp_path, capsys):
    """torch.save -> load_segmenter_checkpoint -> fidelity CLI, all from
    disk, reproducing the reference inference pipeline (prepare_img ->
    pad-to-stride -> forward -> AC=True bilinear up -> crop) in torch to
    produce the golden."""
    from segtpu.utils.helpers import prepare_img
    from segtpu.main_search import main

    num_classes = 7
    genotype = ARCHS["arch0"]
    torch.manual_seed(11)
    twin = TorchSegmenter(genotype, num_classes).eval()
    _randomize_bn(twin, 12)

    ckpt = str(tmp_path / "arch0_drill.ckpt")
    _released_style_ckpt(twin, ckpt)

    # golden: reference inference semantics on a non-stride-multiple image
    rng = np.random.RandomState(0)
    h, w = 56, 72                      # pads to 64x96
    hp, wp = 64, 96
    img_u8 = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    x = prepare_img(img_u8)            # normalized f32 HWC
    x = np.pad(x, ((0, hp - h), (0, wp - w), (0, 0)))
    with torch.no_grad():
        logits = twin(torch.from_numpy(
            np.transpose(x[None], (0, 3, 1, 2)).copy()))
        logits = F.interpolate(logits, size=(hp, wp), mode="bilinear",
                               align_corners=True)[:, :, :h, :w]
    golden = str(tmp_path / "golden0.npz")
    np.savez(golden, image=img_u8,
             logits=np.transpose(logits.numpy(), (0, 2, 3, 1))[0])

    main(["fidelity", "--arch", "arch0", "--num-classes", str(num_classes),
          "--ckpt", ckpt, "--golden", golden, "--max-dlogit", "1e-3"])
    out = capsys.readouterr().out
    assert "worst max|dlogit|" in out
    worst = float(out.rsplit("worst max|dlogit|:", 1)[1].split()[0])
    assert worst < 1e-3

    # and the gate actually gates: a wrong checkpoint (fresh random
    # weights) must exit nonzero
    torch.manual_seed(99)
    wrong = TorchSegmenter(genotype, num_classes).eval()
    wrong_ckpt = str(tmp_path / "wrong.ckpt")
    _released_style_ckpt(wrong, wrong_ckpt)
    with pytest.raises(SystemExit):
        main(["fidelity", "--arch", "arch0",
              "--num-classes", str(num_classes), "--ckpt", wrong_ckpt,
              "--golden", golden, "--max-dlogit", "1e-3"])
