"""The training harness the reference implies but never ships: a complete
weakly-supervised adversarial trainer with eval, checkpointing, profiling,
and optional data parallelism (SURVEY.md §1 "implied trainer" layer;
reference README.md:28-41 delegates this to Lightning+submitit off-tree).
"""
from __future__ import annotations

import logging
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from octave_tpu.data import datasets as ds
from octave_tpu.data.preprocess import prepare_batch
from octave_tpu.models.discriminator import DiscriminatorBlock
from octave_tpu.models.segmentor import (
    ResnestUNet,
    ResnestUnetParallelHead,
    ResnestUnetParallelHeadAttentionGate,
)
from octave_tpu.train.schedule import make_optimizer, polynomial_decay
from octave_tpu.train.state import TrainState
from octave_tpu.train.steps import StepConfig, make_multi_step, make_train_step
from octave_tpu.utils.config import Config
from octave_tpu.utils.logging import MetricsLogger
from octave_tpu.utils.profiling import StepTimer

log = logging.getLogger("octave_tpu")


def _parse_remat_blocks(remat) -> object:
    """train.remat → the segmentors' remat_blocks field: 'block' → True,
    'block-enc' → 'encoder', 'block:<digits>' → that set of decoder stage
    indices (backbone always remated); anything else → False (the step-
    level remat modes False/True/'conv' need no model-side wiring).
    A '+conv' suffix (see _remat_saves_convs) is accepted and stripped, as
    is an 'e<digits>' encoder part (see _parse_remat_enc_layers)."""
    if isinstance(remat, str) and remat.endswith("+conv"):
        remat = remat[: -len("+conv")]
    if remat == "block":
        return True
    if remat == "block-enc":
        return "encoder"
    if isinstance(remat, str) and remat.startswith("block:"):
        dec = remat[len("block:"):].split("e", 1)[0]
        idx = frozenset(int(c) for c in dec) if dec.isdigit() else frozenset()
        if not idx or not idx <= {0, 1, 2, 3, 4}:
            raise ValueError(f"remat {remat!r}: decoder indices must be 0-4")
        return idx
    if isinstance(remat, str) and remat.startswith("block"):
        raise ValueError(f"unknown remat mode {remat!r}")
    return False


def _parse_remat_enc_layers(remat) -> object:
    """Optional 'e<digits>' part of 'block:<dec>e<enc>[+conv]' → the
    segmentors' remat_enc_layers field: which encoder layers (1-based 1..4)
    stay remated; the rest keep their activations saved, so their backward
    skips the forward recompute (the same per-stage trade the decoder
    indices make). No 'e' part → True (all layers remated, the default).
    E.g. 'block:012e12' = decoder stages {0,1,2} + encoder layers {1,2}
    remated; decoder 3-4 and encoder 3-4 saved."""
    if not (isinstance(remat, str) and remat.startswith("block:")):
        return True
    if remat.endswith("+conv"):
        remat = remat[: -len("+conv")]
    parts = remat[len("block:"):].split("e", 1)
    if len(parts) == 1:
        return True
    enc = parts[1]
    idx = frozenset(int(c) for c in enc) if enc.isdigit() else frozenset()
    if not idx or not idx <= {1, 2, 3, 4}:
        raise ValueError(f"remat {remat!r}: encoder layers must be 1-4")
    return idx


def _remat_saves_convs(remat) -> bool:
    """'+conv' suffix on a block remat mode ('block+conv', 'block:012+conv'):
    each checkpoint region saves its conv outputs, so the backward recomputes
    only the elementwise/norm chain between convs (models' remat_save_convs
    field)."""
    return isinstance(remat, str) and remat.startswith("block") \
        and remat.endswith("+conv")


def build_dataset(cfg: Config, split: str = "train"):
    d = cfg.data
    # the dual-decoder variants take per-head targets (ROSE thick/thin)
    dual = cfg.model.architecture in ("parallel_head", "parallel_head_gate")
    if d.dataset == "synthetic":
        return ds.SyntheticOcta(size=tuple(d.image_size), n=d.synthetic_n,
                                seed=cfg.train.seed + (0 if split == "train" else 1))
    if d.dataset == "rose":
        return ds.rose(d.root, d.subset, split, dual=dual)
    if d.dataset == "octa500":
        return ds.octa500(d.root, d.subset, split)
    raise ValueError(f"unknown dataset: {d.dataset}")


class Trainer:
    """End-to-end harness for BASELINE.json configs #4-5 (weak supervision /
    full adversarial training)."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)

        m = cfg.model
        axis = "data" if cfg.train.data_parallel else None
        gl = m.segmentor_gating_level

        # --- segmentor family by config (every documented architecture
        # trains through the same step; VERDICT r2 item 1) ---------------
        # 'block' → remat every Bottleneck + decoder stage;
        # 'block-enc' → backbone only (decoder activations stay saved);
        # 'block:012' → backbone + exactly decoder stages {0,1,2}
        remat_blocks = _parse_remat_blocks(cfg.train.remat)
        remat_convs = _remat_saves_convs(cfg.train.remat)
        remat_enc = _parse_remat_enc_layers(cfg.train.remat)
        if m.architecture == "unet":
            self.segmentor = ResnestUNet(
                num_classes=m.num_classes,
                gating_level=gl,
                encoder_gating=m.encoder_gating,
                bn_axis_name=axis,
                remat_blocks=remat_blocks,
                remat_save_convs=remat_convs,
                remat_enc_layers=remat_enc,
            )
            # pyramid: gates at decoder depths d with gl >= d, d in 4..0
            pyr_levels = {"main": min(gl, 4) + 1}
        elif m.architecture == "parallel_head":
            self.segmentor = ResnestUnetParallelHead(
                num_classes=m.num_classes, bn_axis_name=axis,
                remat_blocks=remat_blocks,
                remat_save_convs=remat_convs,
                remat_enc_layers=remat_enc,
            )
            pyr_levels = {}  # no attention pyramid → no adversarial branch
        elif m.architecture == "parallel_head_gate":
            self.segmentor = ResnestUnetParallelHeadAttentionGate(
                num_classes=m.num_classes, gating_level=gl, bn_axis_name=axis,
                remat_blocks=remat_blocks,
                remat_save_convs=remat_convs,
                remat_enc_layers=remat_enc,
            )
            # depth-4 gate is strict `> 3` (segmentor.py:468); the c branch
            # gates depths 1 and 0 only
            pyr_levels = {
                "main": (5 if gl > 3 else max(gl, 0) + 1),
                "c": min(gl, 1) + 1,
            }
        else:
            raise ValueError(
                f"unknown model.architecture {m.architecture!r}; expected "
                "'unet' | 'parallel_head' | 'parallel_head_gate'"
            )

        # --- discriminators: one per attention pyramid, depth clamped to
        # the pyramid the model actually emits --------------------------
        self._disc_depths = {}
        discs = {}
        if m.discriminator_depth > 0 and pyr_levels:
            for name, levels in pyr_levels.items():
                depth = min(m.discriminator_depth, levels - 1)
                if depth < m.discriminator_depth:
                    log.info(
                        "discriminator[%s] depth clamped %d → %d (the %s "
                        "pyramid has %d levels)",
                        name, m.discriminator_depth, depth, name, levels,
                    )
                self._disc_depths[name] = depth
                discs[name] = DiscriminatorBlock(
                    input_hw=tuple(cfg.data.image_size),
                    depth=depth,
                    num_filters=m.num_filters,
                    instance_noise=m.instance_noise,
                    label_noise=m.label_noise,
                )
        elif m.discriminator_depth > 0:
            log.info(
                "architecture %r emits no attention pyramid — training "
                "without the adversarial branch", m.architecture,
            )
        # single-pyramid models keep the flat (non-dict) state tree so r2
        # checkpoints stay loadable
        if set(discs) == {"main"}:
            self.discriminator = discs["main"]
        else:
            self.discriminator = discs or None

        self.step_cfg = StepConfig(
            num_classes=m.num_classes,
            weakly_supervise=m.weakly_supervise,
            lambda_ild=cfg.loss.lambda_ild,
            lambda_adv=cfg.loss.lambda_adv,
            ild_weights=cfg.loss.ild_weights,
            ild_stop_gradient=cfg.loss.ild_stop_gradient,
            ild_divergence=cfg.loss.ild_divergence,
            use_discriminator=self.discriminator is not None,
            discriminator_depth=self._disc_depths.get("main", m.discriminator_depth),
            discriminator_depth_c=self._disc_depths.get("c", 1),
            remat=cfg.train.remat,
            compute_dtype=cfg.train.compute_dtype,
            dense_groups=cfg.train.dense_groups,
            einsum_groups=cfg.train.einsum_groups,
            axis_name=axis,
        )
        self.mesh = None
        self._make_steps()

    # ------------------------------------------------------------------
    def init_state(self) -> TrainState:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.train.seed)
        k_seg, k_disc, k_state = jax.random.split(key, 3)
        h, w = cfg.data.image_size
        img = jnp.zeros((1, h, w, cfg.data.in_channels), jnp.float32)
        seg_vars = self.segmentor.init(k_seg, img, False)

        o = cfg.optim
        seg_tx = make_optimizer(
            schedule=polynomial_decay(o.seg_lr, o.end_lr, o.decay_steps, o.power),
            weight_decay=o.weight_decay, grad_clip=o.grad_clip,
            moment_dtype=o.moment_dtype,
        )
        disc_params = spectral = None
        disc_tx = None
        if self.discriminator is not None:
            def init_disc(block, depth, key):
                pyr = [
                    jnp.zeros((1, h // 2**i, w // 2**i, cfg.model.num_classes),
                              jnp.float32)
                    for i in range(depth + 1)
                ]
                return block.init({"params": key, "noise": key}, pyr, False)

            if isinstance(self.discriminator, dict):
                disc_params, spectral = {}, {}
                for di, (name, block) in enumerate(sorted(self.discriminator.items())):
                    dv = init_disc(block, self._disc_depths[name],
                                   jax.random.fold_in(k_disc, di))
                    disc_params[name] = dv["params"]
                    spectral[name] = dv.get("spectral")
            else:
                dv = init_disc(self.discriminator,
                               self._disc_depths.get("main",
                                                     cfg.model.discriminator_depth),
                               k_disc)
                disc_params = dv["params"]
                spectral = dv.get("spectral")
            disc_tx = make_optimizer(
                schedule=polynomial_decay(o.disc_lr, o.end_lr, o.decay_steps, o.power),
                grad_clip=o.grad_clip, moment_dtype=o.moment_dtype,
            )

        state = TrainState.create(
            seg_params=seg_vars["params"],
            disc_params=disc_params,
            batch_stats=seg_vars["batch_stats"],
            spectral=spectral,
            seg_tx=seg_tx,
            disc_tx=disc_tx,
            rng=k_state,
        )
        if cfg.model.pretrain:
            state = self.load_pretrained_backbone(state, cfg.model.weight_path)
        if self.mesh is not None:
            from octave_tpu.parallel.mesh import replicate

            state = replicate(state, self.mesh)
        return state

    def load_pretrained_backbone(self, state: TrainState, path: str) -> TrainState:
        """Load the resnest50 .pth into the segmentor's backbone (the
        reference constructor's pretrian=True path, octa.py:21,44)."""
        from octave_tpu.utils.torch_convert import (
            convert_resnest50,
            load_torch_state_dict,
            merge_variables,
        )

        sd = load_torch_state_dict(path)
        conv = convert_resnest50(sd, with_fc=False)
        merged = merge_variables(
            {
                "params": state.seg_params["backbone"],
                "batch_stats": state.batch_stats["backbone"],
            },
            conv,
        )
        seg_params = dict(state.seg_params)
        seg_params["backbone"] = merged["params"]
        batch_stats = dict(state.batch_stats)
        batch_stats["backbone"] = merged["batch_stats"]
        return state.replace(seg_params=seg_params, batch_stats=batch_stats)

    # ------------------------------------------------------------------
    def _make_steps(self):
        # ONE eval entry point: the exact dataset-level accumulate step
        # (`evaluate` below). The per-batch-metric eval step and its pmean'd
        # mesh wrapper were removed — averaging per-batch metrics is biased
        # for unequal batch difficulty (VERDICT r2 item 9).
        from octave_tpu.train.steps import make_eval_accumulate_step

        step = make_train_step(self.segmentor, self.discriminator, self.step_cfg)
        k = max(1, int(self.cfg.train.steps_per_call))
        step = make_multi_step(step, k)
        acc = make_eval_accumulate_step(self.segmentor, self.cfg.model.num_classes)
        if self.cfg.train.data_parallel:
            from octave_tpu.parallel.mesh import (
                make_mesh,
                make_parallel_eval_accumulate_step,
                make_parallel_train_step,
            )

            self.mesh = make_mesh(self.cfg.train.n_devices)
            self.train_step = make_parallel_train_step(step, self.mesh,
                                                       stacked=k > 1)
            self._pacc_step = make_parallel_eval_accumulate_step(acc, self.mesh)
        else:
            self.train_step = jax.jit(step, donate_argnums=(0,))
            self._pacc_step = None
        self._acc_step = jax.jit(acc)

    def _device_batch(
        self,
        host_batch: Dict[str, np.ndarray],
        sample_weight: Optional[np.ndarray] = None,
        augment_key: Optional[jax.Array] = None,
        stack_k: int = 1,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        scrib_c = host_batch.get("scribble_c")
        batch = prepare_batch(
            jnp.asarray(host_batch["image"]),
            jnp.asarray(host_batch["scribble"]),
            jnp.asarray(host_batch["mask"]),
            size=tuple(cfg.data.image_size),
            num_classes=cfg.model.num_classes,
            depth=max(cfg.model.discriminator_depth, 1),
            in_channels=cfg.data.in_channels,
            augment_key=augment_key,
            augment_intensity=cfg.data.augment_intensity,
            scribble_c=jnp.asarray(scrib_c) if scrib_c is not None else None,
        )
        if sample_weight is not None:
            batch["sample_weight"] = jnp.asarray(sample_weight, jnp.float32)
        if stack_k > 1:
            # multi-step dispatch: the host rows are k concatenated per-step
            # batches — restack to a leading (k, b, ...) axis (preprocessing
            # and augmentation are per-sample, so one pass over k*b rows is
            # identical to k separate passes)
            batch = jax.tree.map(
                lambda x: x.reshape(stack_k, -1, *x.shape[1:]), batch
            )
        if self.mesh is not None:
            from octave_tpu.parallel.mesh import shard_batch

            batch = shard_batch(batch, self.mesh,
                                axis_pos=1 if stack_k > 1 else 0)
        return batch

    # ------------------------------------------------------------------
    def fit(self, state: Optional[TrainState] = None) -> TrainState:
        cfg = self.cfg
        state = state if state is not None else self.init_state()

        # preemption safety: a TPU maintenance SIGTERM triggers a final
        # checkpoint save before exit (SURVEY.md §5 failure-detection row)
        import signal

        preempted = {"flag": False}

        def _on_sigterm(signum, frame):
            preempted["flag"] = True

        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            pass  # not on the main thread

        ckpt = None
        if cfg.train.checkpoint_dir:
            from octave_tpu.utils.checkpoint import CheckpointManager

            ckpt = CheckpointManager(cfg.train.checkpoint_dir)
            restored = ckpt.restore_latest(state)
            if restored is not None:
                state = restored
                log.info("resumed from step %d", int(state.step))

        train_ds = build_dataset(cfg, "train")
        it = ds.batch_iterator(train_ds, cfg.data.batch_size, seed=cfg.train.seed)
        # deterministic augmentation stream, resume-stable via the step count
        self._aug_key = jax.random.fold_in(
            jax.random.PRNGKey(cfg.train.seed + 7919), int(state.step)
        )
        mlog = MetricsLogger(cfg.train.log_dir) if cfg.train.log_dir else None
        timer = StepTimer()

        if cfg.train.profile_dir:
            jax.profiler.start_trace(cfg.train.profile_dir)

        t0 = time.perf_counter()
        window = []
        kpc = max(1, int(cfg.train.steps_per_call))
        if kpc > 1:
            # multi-step dispatch: feed k concatenated per-step batches per
            # call (restacked to (k, b, ...) in _device_batch)
            def _grouped(src):
                src = iter(src)
                while True:
                    try:
                        grp = [next(src) for _ in range(kpc)]
                    except StopIteration:
                        return
                    yield {key: np.concatenate([g[key] for g in grp])
                           for key in grp[0]}

            it = _grouped(it)

        def _crossed(step: int, every: int) -> bool:
            # "cadence boundary crossed by this call" — identical to
            # step % every == 0 at kpc=1, robust when step advances by kpc
            return every > 0 and (step // every) > ((step - kpc) // every)

        # Host-side step counter: reading `state.step` off the device every
        # iteration would force a full sync per step, serializing host batch
        # prep behind device compute. The count is deterministic (+kpc per
        # call), so the host tracks it and lets JAX's async dispatch overlap
        # the next batch's decode/augment/upload with the running step. The
        # `inflight` deque bounds the run-ahead (each queued call pins its
        # batch buffers on device) by blocking on the oldest step's losses.
        from collections import deque

        host_step = int(state.step)
        ahead = max(0, int(cfg.train.dispatch_ahead))
        inflight: deque = deque()
        try:
            for host_batch in it:
                if host_step >= cfg.train.steps:
                    break
                if preempted["flag"]:
                    log.warning("SIGTERM received — saving and stopping at step %d",
                                host_step)
                    break
                aug_key = None
                if cfg.data.augment:
                    self._aug_key, aug_key = jax.random.split(self._aug_key)
                batch = self._device_batch(host_batch, augment_key=aug_key,
                                           stack_k=kpc)
                state, losses = self.train_step(state, batch)
                host_step += kpc
                inflight.append(losses)
                while len(inflight) > ahead:
                    jax.block_until_ready(inflight.popleft())
                timer.tick()
                window.append(losses)
                step = host_step
                if _crossed(step, cfg.train.log_every):
                    mean = {
                        k: float(np.mean([float(l[k]) for l in window]))
                        for k in window[-1]
                    }
                    dt = time.perf_counter() - t0
                    ips = cfg.data.batch_size * kpc * len(window) / dt
                    log.info("step %d  %s  %.1f img/s", step,
                             "  ".join(f"{k}={v:.4f}" for k, v in mean.items()), ips)
                    if mlog is not None:
                        mlog.log(step,
                                 {**mean, "img_per_s_wall": ips,
                                  **timer.stats(cfg.data.batch_size * kpc)},
                                 prefix="train/")
                    window, t0 = [], time.perf_counter()
                if ckpt is not None and _crossed(step, cfg.train.checkpoint_every):
                    ckpt.save(step, state)
                if _crossed(step, cfg.train.eval_every):
                    self.evaluate(state)
        finally:
            if cfg.train.profile_dir:
                jax.profiler.stop_trace()
            if ckpt is not None:
                ckpt.save(int(state.step), state)
                ckpt.wait()
                ckpt.close()
            if mlog is not None:
                mlog.close()
            if prev_handler is not None:
                import signal as _s

                _s.signal(_s.SIGTERM, prev_handler)
        return state

    # ------------------------------------------------------------------
    def evaluate(self, state: TrainState) -> Dict[str, float]:
        """Dataset-level metrics via streaming confusion/ROC accumulation —
        identical semantics single-device and under the mesh (the sharded
        path psums the SAME accumulators; a tail batch is padded to a
        multiple of the mesh size with zero-weight samples, so nothing is
        dropped and nothing is double-counted)."""
        from octave_tpu.utils.metrics import AucAccumulator, ConfusionAccumulator

        cfg = self.cfg
        eval_ds = build_dataset(cfg, "test")
        # host-side int64 accumulation: per-batch device counts are exact
        # int32; summing batches in int64 keeps dataset-scale counts exact
        # (float32 would round above 2^24 pixels — VERDICT r2 item 5)
        conf = ConfusionAccumulator.empty_host()
        auc = AucAccumulator.empty_host()
        n_shards = self.mesh.devices.size if self.mesh is not None else 1
        for host_batch in ds.batch_iterator(
            eval_ds, cfg.data.batch_size, shuffle=False, epochs=1, drop_last=False
        ):
            b = host_batch["image"].shape[0]
            pad = (-b) % n_shards
            weight = np.ones((b + pad,), np.float32)
            if pad:
                weight[b:] = 0.0
                host_batch = {
                    k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                    for k, v in host_batch.items()
                }
            batch = self._device_batch(host_batch, sample_weight=weight)
            if self.mesh is not None:
                c, a = self._pacc_step(state.seg_params, state.batch_stats, batch)
            else:
                _, c, a = self._acc_step(state.seg_params, state.batch_stats, batch)
            conf = ConfusionAccumulator(
                *(x + y for x, y in zip(conf, ConfusionAccumulator(*c).astype64()))
            )
            auc = AucAccumulator(
                *(x + y for x, y in zip(auc, AucAccumulator(*a).astype64()))
            )
        agg = {
            "dice": float(conf.dice()),
            "iou": float(conf.iou()),
            "accuracy": float(conf.accuracy()),
            "sensitivity": float(conf.sensitivity()),
            "specificity": float(conf.specificity()),
            "auc": float(auc.auc()),
        }
        log.info("eval  %s", "  ".join(f"{k}={v:.4f}" for k, v in agg.items()))
        return agg
