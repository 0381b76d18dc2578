"""octave-tpu: TPU-native JAX framework for weakly-supervised OCTA vessel
segmentation (OCTAve, IEEE TBME 2022), rebuilt from scratch for
jax/XLA/pallas/pjit. See SURVEY.md for the reference layer map."""

__version__ = "0.1.0"
