"""octave-tpu command line: train / eval / convert-weights / bench.

Usage:
    python -m octave_tpu.cli train  [--config cfg.yaml] [k.ey=value ...]
    python -m octave_tpu.cli eval   --checkpoint DIR [k.ey=value ...]
    python -m octave_tpu.cli convert --pth resnest50.pth --out weights/
    python -m octave_tpu.cli bench

The reference has no CLI (configuration = constructor kwargs only,
SURVEY.md §5); dotted overrides map 1:1 onto those kwargs via
octave_tpu.utils.config.Config.
"""
from __future__ import annotations

import argparse
import logging
import sys
from typing import Dict, List


def _parse_overrides(items: List[str]) -> Dict[str, str]:
    out = {}
    for it in items:
        if "=" not in it:
            raise SystemExit(f"override must be key=value, got: {it}")
        k, v = it.split("=", 1)
        out[k] = v
    return out


def _load_cfg(args):
    from octave_tpu.utils.config import Config

    cfg = Config.load(args.config) if args.config else Config()
    if args.overrides:
        cfg = cfg.apply_overrides(_parse_overrides(args.overrides))
    return cfg


def cmd_train(args) -> int:
    from octave_tpu.train.trainer import Trainer

    cfg = _load_cfg(args)
    trainer = Trainer(cfg)
    state = trainer.fit()
    metrics = trainer.evaluate(state)
    print({k: round(v, 4) for k, v in metrics.items()})
    return 0


def cmd_eval(args) -> int:
    from octave_tpu.train.trainer import Trainer
    from octave_tpu.utils.checkpoint import CheckpointManager

    cfg = _load_cfg(args)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    if args.checkpoint:
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore_latest(state)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.checkpoint}")
        state = restored
    metrics = trainer.evaluate(state)
    print({k: round(v, 4) for k, v in metrics.items()})
    return 0


def cmd_convert(args) -> int:
    import hashlib
    import re

    from octave_tpu.utils.checkpoint import save_pytree
    from octave_tpu.utils.torch_convert import convert_resnest50, load_torch_state_dict

    # checksum-verified ingest (VERDICT r2 item 6): --sha256 checks the full
    # digest; otherwise a torch-hub style `-<hex>` filename fragment (e.g.
    # resnest50-528c19ca.pth) is verified as a digest prefix automatically
    with open(args.pth, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    if args.sha256:
        if digest != args.sha256.lower():
            raise SystemExit(
                f"sha256 mismatch for {args.pth}: got {digest}, "
                f"expected {args.sha256}"
            )
        print(f"sha256 verified: {digest}")
    else:
        m = re.search(r"-([0-9a-f]{8,})\.pth$", args.pth)
        if m:
            frag = m.group(1)
            if not digest.startswith(frag):
                raise SystemExit(
                    f"filename hash fragment {frag!r} does not match the "
                    f"file's sha256 {digest} — corrupted or renamed download"
                )
            print(f"sha256 prefix verified via filename: {digest}")

    sd = load_torch_state_dict(args.pth)
    tree = convert_resnest50(sd, with_fc=not args.no_fc, strict=not args.lenient)
    save_pytree(args.out, tree)
    n = sum(x.size for x in __import__("jax").tree.leaves(tree))
    print(f"converted {len(sd)} torch tensors -> {args.out} ({n / 1e6:.1f}M params)")
    return 0


def cmd_predict(args) -> int:
    """Segment a directory of images; writes per-image vessel-probability
    maps as .npy files."""
    import os

    import numpy as np

    from octave_tpu.data.datasets import load_image_batch
    from octave_tpu.data.datasets import _list_images
    from octave_tpu.serve import Predictor
    from octave_tpu.utils.checkpoint import CheckpointManager
    from octave_tpu.utils.imageio import write_png_gray

    cfg = _load_cfg(args)
    size = tuple(cfg.data.image_size)
    paths = _list_images(args.images)
    if not paths:
        raise SystemExit(f"no images found in {args.images}")

    os.makedirs(args.out, exist_ok=True)
    bs = cfg.data.batch_size

    def batches():
        for i in range(0, len(paths), bs):
            chunk = paths[i : i + bs]
            imgs = load_image_batch(chunk, size)
            x = np.repeat((imgs.astype(np.float32) / 255.0)[..., None], 3, axis=-1)
            yield x

    kw = {}
    if getattr(args, "int8", False):
        # PTQ the decoder; the first batch doubles as the calibration set
        kw = dict(int8_decoder=True, calibration_batches=[next(batches())])

    variables = None
    if args.checkpoint:
        from octave_tpu.train.trainer import Trainer

        trainer = Trainer(cfg)
        state = trainer.init_state()
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore_latest(state)
        if restored is None:
            raise SystemExit(f"no checkpoint in {args.checkpoint}")
        variables = {"params": restored.seg_params, "batch_stats": restored.batch_stats}

    if variables is None:
        pred = Predictor.initialize(image_hw=size, num_classes=cfg.model.num_classes, **kw)
    else:
        pred = Predictor(variables, num_classes=cfg.model.num_classes, **kw)

    i = 0
    for out in pred.predict_stream(batches()):
        for b in range(out.shape[0]):
            if i >= len(paths):
                break
            name = os.path.splitext(os.path.basename(paths[i]))[0]
            vessel = out[b, ..., 1] if out.shape[-1] > 1 else out[b, ..., 0]
            np.save(os.path.join(args.out, name + "_prob.npy"), vessel)
            write_png_gray(os.path.join(args.out, name + "_mask.png"),
                           (vessel >= 0.5).astype(np.uint8) * 255)
            i += 1
    print(f"wrote {i} predictions to {args.out}")
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(name)s %(message)s", stream=sys.stderr
    )
    p = argparse.ArgumentParser(prog="octave_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name, fn in (("train", cmd_train), ("eval", cmd_eval)):
        sp = sub.add_parser(name)
        sp.add_argument("--config", default=None, help="YAML/JSON config path")
        if name == "eval":
            sp.add_argument("--checkpoint", default=None)
        sp.add_argument("overrides", nargs="*", help="dotted key=value overrides")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("convert")
    sp.add_argument("--pth", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--no-fc", action="store_true")
    sp.add_argument("--sha256", default=None,
                    help="expected sha256 of the .pth (fails on mismatch)")
    sp.add_argument("--lenient", action="store_true",
                    help="skip the strict full-key-coverage assert")
    sp.set_defaults(fn=cmd_convert)

    sp = sub.add_parser("predict")
    sp.add_argument("--images", required=True, help="directory of input images")
    sp.add_argument("--out", required=True, help="output directory")
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--config", default=None)
    sp.add_argument("--int8", action="store_true",
                    help="int8-quantize the decoder (PTQ, calibrates on the "
                         "first batch; see octave_tpu/ops/quant.py)")
    sp.add_argument("overrides", nargs="*")
    sp.set_defaults(fn=cmd_predict)

    sp = sub.add_parser("bench")
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
