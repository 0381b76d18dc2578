"""Structured metrics logging: JSONL always, W&B / TensorBoard when present.

The reference pins wandb and tensorboardx for its off-tree harness
(reference requirements.txt:10-11) without any in-tree logging code; this is
the in-framework equivalent with gated imports (neither is installed in the
TPU image — the JSONL sink always works).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        use_wandb: bool = False,
        use_tensorboard: bool = False,
        project: str = "octave-tpu",
        run_name: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
    ):
        self.log_dir = log_dir
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, name=run_name, config=config or {})
            except ImportError:
                pass

        self._tb = None
        if use_tensorboard and log_dir:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(log_dir)
            except ImportError:
                try:
                    from tensorboardX import SummaryWriter

                    self._tb = SummaryWriter(log_dir)
                except ImportError:
                    pass

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        record = {f"{prefix}{k}": float(v) for k, v in metrics.items()}
        record["step"] = int(step)
        record["time"] = time.time()
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(record, step=int(step))
        if self._tb is not None:
            for k, v in record.items():
                if k not in ("step", "time"):
                    try:
                        self._tb.scalar(k, v, int(step))
                    except AttributeError:
                        self._tb.add_scalar(k, v, int(step))

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            try:
                self._tb.close()
            except Exception:
                pass
        if self._wandb is not None:
            self._wandb.finish()
