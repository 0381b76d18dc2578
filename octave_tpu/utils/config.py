"""Config system: dataclasses mirroring the reference constructor surface
1:1 (defaults equal reference defaults, octa.py:16-29) + YAML/CLI front-end.

The reference has no config system — configuration is Python kwargs only
(SURVEY.md §5). These dataclasses are that surface made declarative.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass
class ModelConfig:
    """OctaScribbleNet constructor surface (reference octa.py:16-29)."""

    # segmentor family: 'unet' (ResnestUNet, the OctaScribbleNet default) |
    # 'parallel_head' (ResnestUnetParallelHead, dual thick/thin decoders) |
    # 'parallel_head_gate' (ResnestUnetParallelHeadAttentionGate)
    architecture: str = "unet"
    num_classes: int = 2
    num_filters: int = 64
    instance_noise: bool = True
    label_noise: bool = True
    segmentor_gating_level: int = 4
    discriminator_depth: int = 4
    encoder_gating: bool = False
    weakly_supervise: bool = True
    pretrain: bool = False
    weight_path: str = "resnest50-528c19ca.pth"


@dataclasses.dataclass
class DataConfig:
    dataset: str = "synthetic"  # synthetic | rose | octa500
    root: str = "./data"
    subset: str = "ROSE-1/SVC"  # rose subset or octa500 fov (3M/6M)
    image_size: Tuple[int, int] = (304, 304)
    batch_size: int = 8
    in_channels: int = 3
    synthetic_n: int = 64
    # train-time device-side augmentation (data/augment.py): random D4
    # dihedral per sample; intensity > 0 adds brightness/contrast jitter
    augment: bool = False
    augment_intensity: float = 0.0


@dataclasses.dataclass
class OptimConfig:
    seg_lr: float = 1e-4
    disc_lr: float = 1e-4
    end_lr: float = 1e-6
    power: float = 0.9
    decay_steps: int = 10_000
    weight_decay: float = 0.0
    grad_clip: Optional[float] = None
    # 'bfloat16': Adam first moment in bf16 (schedule.make_optimizer)
    moment_dtype: Optional[str] = None


@dataclasses.dataclass
class LossConfig:
    lambda_ild: float = 1.0
    lambda_adv: float = 1.0
    ild_divergence: str = "KLD"
    ild_stop_gradient: bool = False
    ild_weights: Optional[Tuple[float, ...]] = None


@dataclasses.dataclass
class TrainConfig:
    steps: int = 1000
    eval_every: int = 200
    log_every: int = 50
    # train steps fused into one device dispatch (train/steps.py
    # make_multi_step) — amortizes per-dispatch overhead (~116 ms/step
    # measured at B=128/304² on the v5e relay). log/eval/checkpoint cadence
    # is honored at call granularity; `steps` may overshoot by < this.
    steps_per_call: int = 1
    # max dispatched-but-unfinished train calls the host runs ahead of the
    # device (trainer.fit): overlaps next-batch decode/augment/upload with
    # the running step. 0 = block on every step (the pre-r4 synchronous
    # loop); each in-flight call pins one batch's buffers on device.
    dispatch_ahead: int = 2
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 500
    seed: int = 0
    data_parallel: bool = False
    n_devices: Optional[int] = None
    profile_dir: Optional[str] = None
    log_dir: Optional[str] = None
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16'
    # False | True (full) | 'conv' (save conv outputs only) | 'block' |
    # 'block-enc' | 'block:<decoder stage indices>' (e.g. 'block:012') —
    # see train/steps.py StepConfig.remat
    remat: Any = False
    # None | 'decoder' | 'all': lower grouped convs dense in the TRAIN graph
    # (see train/steps.py StepConfig.dense_groups)
    dense_groups: Optional[str] = None
    # None | same grammar (+ 'enc', '+'-combos): lower grouped convs as
    # shifted batched matmuls (see train/steps.py StepConfig.einsum_groups)
    einsum_groups: Optional[str] = None
    debug_nans: bool = False


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        def build(dc_cls, sub):
            fields = {f.name: f for f in dataclasses.fields(dc_cls)}
            kwargs = {}
            for k, v in (sub or {}).items():
                if k.startswith("_"):
                    continue  # comment keys
                if k not in fields:
                    raise KeyError(f"unknown config key: {dc_cls.__name__}.{k}")
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return dc_cls(**kwargs)

        unknown = {k for k in d if not k.startswith("_")} - {
            "model", "data", "optim", "loss", "train"
        }
        if unknown:
            raise KeyError(f"unknown config sections: {sorted(unknown)}")
        return cls(
            model=build(ModelConfig, d.get("model")),
            data=build(DataConfig, d.get("data")),
            optim=build(OptimConfig, d.get("optim")),
            loss=build(LossConfig, d.get("loss")),
            train=build(TrainConfig, d.get("train")),
        )

    @classmethod
    def load(cls, path: str) -> "Config":
        """Load a YAML or JSON config file."""
        with open(path) as f:
            text = f.read()
        if path.endswith((".yaml", ".yml")):
            try:
                import yaml

                return cls.from_dict(yaml.safe_load(text) or {})
            except ImportError:
                raise RuntimeError("pyyaml not installed; use a .json config")
        return cls.from_dict(json.loads(text))

    def apply_overrides(self, overrides: Dict[str, Any]) -> "Config":
        """Dotted-key overrides, e.g. {'data.batch_size': 16}."""
        d = self.to_dict()
        for key, val in overrides.items():
            parts = key.split(".")
            cur = d
            for p in parts[:-1]:
                cur = cur[p]
            leaf = parts[-1]
            if leaf not in cur:
                raise KeyError(f"unknown config key: {key}")
            old = cur[leaf]
            if isinstance(old, (list, tuple)) and isinstance(val, str):
                # CLI list syntax: [a,b] or a,b
                val = [json.loads(v) for v in val.strip("[]() ").split(",") if v]
            elif old is not None and not isinstance(old, (list, tuple, dict)) and not isinstance(val, type(old)):
                # coerce CLI strings to the field's type
                if isinstance(old, bool):
                    sval = str(val).lower()
                    if sval in ("1", "true", "yes", "0", "false", "no"):
                        val = sval in ("1", "true", "yes")
                    # else: bool-or-mode fields keep the string
                    # (e.g. train.remat='conv' selective remat)
                elif isinstance(old, int):
                    val = int(val)
                elif isinstance(old, float):
                    val = float(val)
            cur[leaf] = val
        return Config.from_dict(d)
