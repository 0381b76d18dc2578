"""Profile the adversarial train step on the attached TPU: per-fusion device
times joined with HLO op metadata, aggregated by model region and by
forward/backward/optimizer phase.

Answers VERDICT r2 item 2 (training is the one axis with no measured
"where does the time go" story): which regions pay the 500+ ms at B=64/304²
— segmentor forward, segmentor backward, discriminator (3 applies + 2
backwards), losses, or the optimizer/HBM-bound tail.

Env: PROF_BATCH (default 64), PROF_REMAT ('false'|'true'|'block'|'conv').
Writes the table to stdout and benchmarks/profile_train.txt.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def region_of(name: str) -> str:
    m = re.search(r"(decoder_\d|upsampling_\d|aag_\d|backbone/stem|"
                  r"backbone/layer\d|discriminator|wpce|interlayer|dice|"
                  r"gan|adamw?|polynomial|clip|spectral|fc)", name)
    if m:
        return m.group(1)
    return "(other)"


def phase_of(name: str) -> str:
    """Forward vs backward (transpose of) vs update, from the op_name path."""
    if re.search(r"adamw?|apply_updates|scale_by|clip", name):
        return "optimizer"
    if "transpose" in name and ("jvp" in name or "vjp" in name):
        return "backward"
    if re.search(r"disc", name):
        return "discriminator"
    return "forward/other"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octave_tpu.data.preprocess import (
        mask_pyramid, mask_to_onehot, scribble_to_onehot,
    )
    from octave_tpu.models.discriminator import DiscriminatorBlock
    from octave_tpu.models.segmentor import ResnestUNet
    from octave_tpu.train.schedule import make_optimizer
    from octave_tpu.train.state import TrainState
    from octave_tpu.train.steps import StepConfig, make_train_step

    batch = int(os.environ.get("PROF_BATCH", "64"))
    remat_s = os.environ.get("PROF_REMAT", "false")
    remat = {"false": False, "true": True}.get(remat_s, remat_s)
    hw = 304
    here = os.path.dirname(os.path.abspath(__file__))
    trace_dir = os.path.join(here, "trace_train")

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (batch, hw, hw, 3)), jnp.bfloat16)
    mask = jnp.asarray((rng.uniform(0, 1, (batch, hw, hw)) > 0.6).astype(np.int32))
    scrib = jnp.asarray(
        np.where(rng.uniform(0, 1, (batch, hw, hw)) < 0.3, np.asarray(mask) + 1, 0)
    )
    batch_d = {
        "image": img,
        "scribble_onehot": scribble_to_onehot(scrib, 2),
        "mask_pyramid": mask_pyramid(mask_to_onehot(mask, 2), 4),
    }
    seg = ResnestUNet(num_classes=2, remat_blocks=(remat == "block"))
    disc = DiscriminatorBlock(input_hw=(hw, hw), depth=4)
    key = jax.random.PRNGKey(0)
    seg_vars = seg.init(key, batch_d["image"][:1].astype(jnp.float32), False)
    disc_vars = disc.init(
        {"params": key, "noise": key},
        [p[:1].astype(jnp.float32) for p in batch_d["mask_pyramid"]], False,
    )
    state = TrainState.create(
        seg_params=seg_vars["params"], disc_params=disc_vars["params"],
        batch_stats=seg_vars["batch_stats"], spectral=disc_vars["spectral"],
        seg_tx=make_optimizer(1e-3), disc_tx=make_optimizer(1e-4),
        rng=jax.random.PRNGKey(3),
    )
    cfg = StepConfig(num_classes=2, use_discriminator=True,
                     discriminator_depth=4, compute_dtype="bfloat16",
                     remat=remat)
    # NO donation: we re-run the same step on the same state for stable
    # traces (donation would invalidate `state` after the first call)
    step = jax.jit(make_train_step(seg, disc, cfg))

    new_state, losses = step(state, batch_d)
    jax.block_until_ready(losses)

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        _, losses = step(state, batch_d)
        jax.block_until_ready(losses)
    jax.profiler.stop_trace()

    hlo = step.lower(state, batch_d).compile().as_text()
    op_meta = {}
    for m in re.finditer(r"%?([\w.\-]+) = [^\n]*metadata=\{op_name=\"([^\"]+)\"", hlo):
        op_meta[m.group(1)] = m.group(2)

    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        raise SystemExit(f"no trace file under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    durs = collections.Counter()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "")
        base = name.split(".orig")[0]
        if base in op_meta or re.match(r"^(fusion|convolution|copy|custom-call|"
                                       r"all-reduce|bitcast|transpose|dynamic)", base):
            durs[base] += ev["dur"]

    total = sum(durs.values())
    by_region = collections.Counter()
    by_phase = collections.Counter()
    lines = [
        f"batch={batch} remat={remat_s} total traced device-op time: "
        f"{total/1000:.1f} ms over 3 steps ({total/3000:.1f} ms/step, "
        f"{batch/(total/3e6):.1f} img/s)",
        f"{'op':<44}{'ms/step':>9}{'%':>7}  op_name",
    ]
    for name, d in durs.items():
        meta = op_meta.get(name, "") or name
        by_region[region_of(meta)] += d
        by_phase[phase_of(meta)] += d
    for name, d in durs.most_common(30):
        meta = op_meta.get(name, "")
        lines.append(
            f"{name[:44]:<44}{d/3000:>9.2f}{100*d/total:>6.1f}%  {meta[:70]}"
        )
    lines.append("\nby region (ms/step):")
    for reg, d in by_region.most_common():
        lines.append(f"  {reg:<20}{d/3000:>8.2f}  {100*d/total:.1f}%")
    lines.append("\nby phase (ms/step):")
    for ph, d in by_phase.most_common():
        lines.append(f"  {ph:<20}{d/3000:>8.2f}  {100*d/total:.1f}%")

    out = "\n".join(lines)
    print(out)
    with open(os.path.join(here, "profile_train.txt"), "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
