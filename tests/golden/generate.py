"""Generate the torch-free golden fixture pack (tests/golden/*.npz).

Needs torch + the reference tree at /root/reference — run ONCE on a host
that has both; the resulting fixtures are committed and checked by
tests/test_golden.py with no torch import (VERDICT r3 item 5).

    python tests/golden/generate.py

Weights are the deterministic key-addressed fill from tests/goldens.py
(fill_state_dict) — only the state-dict MANIFEST ships in the npz; see
goldens.py for the protocol.
"""
from __future__ import annotations

import os
import sys
import types

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))          # tests/ (goldens.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root
REFERENCE = "/root/reference"
sys.path.insert(0, REFERENCE)

import numpy as np

from goldens import (
    disc_pyramid,
    fill_state_dict,
    input_array,
    loss_inputs,
    save_fixture,
)


def _stub_ref_deps():
    """kornia/loguru stubs (same as tests/test_losses.py) so the reference
    loss code imports."""
    import torch.nn.functional as F

    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        geometry = types.ModuleType("kornia.geometry")
        transform = types.ModuleType("kornia.geometry.transform")

        def resize(x, size, interpolation="nearest"):
            assert interpolation == "nearest"
            return F.interpolate(x, size=size, mode="nearest")

        transform.resize = resize
        geometry.transform = transform
        kornia.geometry = geometry
        sys.modules["kornia"] = kornia
        sys.modules["kornia.geometry"] = geometry
        sys.modules["kornia.geometry.transform"] = transform
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _L:
            def error(self, *a, **k):
                pass

        loguru.logger = _L()
        sys.modules["loguru"] = loguru


def _load_filled(torch, module):
    manifest = {k: tuple(v.shape) for k, v in module.state_dict().items()}
    module.load_state_dict(
        {k: torch.from_numpy(v) for k, v in fill_state_dict(manifest).items()}
    )
    module.eval()
    return manifest


def gen_unet(torch, name: str, hw: int, seed: int):
    from architectures.segmentor.compose import ResnestUNet as TorchUNet

    torch.manual_seed(0)
    tm = TorchUNet(num_classes=2, pretrain=False, gating_level=4)
    manifest = _load_filled(torch, tm)
    x = input_array(seed, (1, 3, hw, hw))
    with torch.no_grad():
        atts, agg, x4 = tm(torch.from_numpy(x))
        _, pred = tm.predict(torch.from_numpy(x), "softmax")
    outputs = {f"att{i}": a.numpy() for i, a in enumerate(atts)}
    outputs.update(agg=agg.numpy(), pred=pred.numpy())
    if name == "unet112":  # keep the latent only at the small geometry
        outputs["x4"] = x4.numpy()
    path = save_fixture(name, manifest,
                        {"hw": hw, "seed": seed, "gating_level": 4}, outputs)
    print(f"{name}: {os.path.getsize(path)/1e6:.2f} MB")


def gen_phg(torch, name: str, hw: int, seed: int, gating: int):
    from architectures.segmentor.compose import (
        ResnestUnetParallelHeadAttentionGate as TorchPHG,
    )

    torch.manual_seed(0)
    tm = TorchPHG(num_classes=2, pretrain=False, gating_leveL=gating)
    manifest = _load_filled(torch, tm)
    x = input_array(seed, (1, 3, hw, hw))
    with torch.no_grad():
        (atts, atts_c), agg = tm(torch.from_numpy(x))
    outputs = {f"att{i}": a.numpy() for i, a in enumerate(atts)}
    outputs.update({f"attc{i}": a.numpy() for i, a in enumerate(atts_c)})
    outputs["agg"] = agg.numpy()
    path = save_fixture(
        name, manifest,
        {"hw": hw, "seed": seed, "gating_level": gating,
         "n_atts": len(atts), "n_atts_c": len(atts_c)}, outputs)
    print(f"{name}: {os.path.getsize(path)/1e6:.2f} MB")


def gen_ph(torch, name: str, hw: int, seed: int):
    from architectures.segmentor.compose import (
        ResnestUnetParallelHead as TorchPH,
    )

    torch.manual_seed(0)
    tm = TorchPH(num_classes=2, pretrain=False)
    manifest = _load_filled(torch, tm)
    x = input_array(seed, (1, 3, hw, hw))
    with torch.no_grad():
        agg = tm(torch.from_numpy(x))                      # (2, B, C, H, W)
        pred = tm.predict(torch.from_numpy(x), "softmax")
    path = save_fixture(
        name, manifest, {"hw": hw, "seed": seed},
        {"agg": agg.numpy(), "pred": pred.numpy()})
    print(f"{name}: {os.path.getsize(path)/1e6:.2f} MB")


def gen_disc(torch, name: str, seed: int):
    from architectures.discriminator.blocks import DiscriminatorBlock as TorchD

    h = w = 64
    depth = 3
    torch.manual_seed(0)
    tm = TorchD((1, 2, h, w), is_training=False, depth=depth, num_filters=16,
                instance_noise=True, label_noise=False)
    manifest = _load_filled(torch, tm)
    ys = disc_pyramid(seed, 2, 2, h, w, depth)
    with torch.no_grad():
        logits = tm([torch.from_numpy(y) for y in ys]).numpy()
    path = save_fixture(
        name, manifest,
        {"h": h, "w": w, "depth": depth, "num_filters": 16, "seed": seed},
        {"logits": logits})
    print(f"{name}: {os.path.getsize(path)/1e6:.2f} MB")


def gen_losses(torch, name: str):
    _stub_ref_deps()
    import architectures.segmentor.losses as ref
    from architectures.discriminator.losses import (
        LSDiscriminatorialLoss,
        LSGeneratorLoss,
    )

    inp = loss_inputs()

    def t(key):
        # FRESH tensor per call: the reference losses mutate inputs in place
        return torch.from_numpy(inp[key].copy())

    wpce3 = ref.WeightedPartialCE(num_classes=3, manual=True)
    wpce2 = ref.WeightedPartialCE(num_classes=2, manual=True)

    def atts():
        return [t(f"att{s}") for s in (16, 8, 4, 2)]
    vals = {
        "wpce_manual": wpce3(t("wpce_yhat"), t("wpce_ys")).item(),
        "wpce_ignore_bg": wpce2(t("wpce2_yhat"), t("wpce2_ys"),
                                ignore_bg=True).item(),
        "wpce_full": wpce2(t("wpce2_yhat"), t("wpce2_ys"), full=True).item(),
        "wpce_sum": wpce2(t("wpce2_yhat"), t("wpce2_ys"),
                          reduction="sum").item(),
        "dice": ref.DiceLoss()(t("dice_x"), t("dice_y")).item(),
        "image_mse": ref.ImageMseLoss()(t("mse_a"), t("mse_b")).item(),
        "ild_kld": ref.InterlayerDivergence(divergence="KLD")(atts()).item(),
        "ild_jsd": ref.InterlayerDivergence(divergence="JSD")(atts()).item(),
        "ild_weighted": ref.InterlayerDivergence()(
            atts(), weights=[0.5, 0.0, 2.0]).item(),
        "ce_weighted": ref.CELoss(weight=t("ce_w"))(
            t("ce_logits"), t("ce_ytrue")).item(),
        "lsgan_d": LSDiscriminatorialLoss()(t("gan_r"), t("gan_f")).item(),
        "lsgan_g": LSGeneratorLoss()(t("gan_f")).item(),
    }
    path = save_fixture(name, {}, {},
                        {k: np.float32(v) for k, v in vals.items()})
    print(f"{name}: {os.path.getsize(path)/1e6:.3f} MB  {vals}")


def main():
    import torch

    gen_unet(torch, "unet112", 112, seed=101)
    gen_unet(torch, "unet304", 304, seed=103)
    gen_unet(torch, "unet400", 400, seed=104)
    gen_phg(torch, "phg112", 112, seed=105, gating=3)
    gen_ph(torch, "ph112", 112, seed=107)
    gen_disc(torch, "disc64", seed=106)
    gen_losses(torch, "losses")


if __name__ == "__main__":
    main()
