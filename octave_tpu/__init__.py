"""octave-tpu: TPU-native JAX framework for weakly-supervised OCTA vessel
segmentation (OCTAve, IEEE TBME 2022), rebuilt from scratch for
jax/XLA/pallas/pjit. See SURVEY.md for the reference layer map and
docs/ for architecture, parity, and performance notes.

Public surface (lazily imported):
    octave_tpu.models   — OctaScribbleNet, ResnestUNet, DiscriminatorBlock, …
    octave_tpu.losses   — weighted_partial_ce, dice_loss, interlayer_divergence, …
    octave_tpu.train    — Trainer, make_train_step, TrainState, …
    octave_tpu.data     — datasets, device-side preprocessing, native loader
    octave_tpu.parallel — data-mesh utilities (shard_map step, sync BN)
    octave_tpu.serve    — pipelined Predictor
    octave_tpu.utils    — checkpointing, metrics, config, torch conversion
"""

__version__ = "0.1.0"

_LAZY = {
    "OctaScribbleNet": ("octave_tpu.models.octa", "OctaScribbleNet"),
    "octa_scribble_net": ("octave_tpu.models.octa", "octa_scribble_net"),
    "ResnestUNet": ("octave_tpu.models.segmentor", "ResnestUNet"),
    "DiscriminatorBlock": ("octave_tpu.models.discriminator", "DiscriminatorBlock"),
    "Trainer": ("octave_tpu.train.trainer", "Trainer"),
    "Config": ("octave_tpu.utils.config", "Config"),
    "Predictor": ("octave_tpu.serve", "Predictor"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'octave_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
