"""Profile the int8 serving forward on the attached TPU: per-fusion device
times joined with HLO op metadata, aggregated by model region.

Answers round-3 question #1: where does the remaining per-call time go
after int8 decoder quantization — do the quantize/dequant ops fuse into the
convs, and which regions still pay HBM traffic?

Writes the top-K table to stdout and benchmarks/profile_int8.txt.
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
                  r"backbone/layer\d|fc)", name)
    return m.group(1) if m else "(other)"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octave_tpu.serve import Predictor

    batch = int(os.environ.get("PROF_BATCH", "128"))
    hw = 304
    here = os.path.dirname(os.path.abspath(__file__))
    trace_dir = os.path.join(here, "trace_int8")

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (batch, hw, hw, 3)).astype(np.float32)
    pred = Predictor.initialize(
        image_hw=(hw, hw), int8_decoder=True, calibration_batches=[x[:64]],
        dense_groups=os.environ.get("PROF_DENSE") or None,
    )
    xs = pred._put(x)
    for _ in range(2):
        np.asarray(pred._fn(pred.variables, xs)[0, 0, 0, :])

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        np.asarray(pred._fn(pred.variables, xs)[0, 0, 0, :])
    jax.profiler.stop_trace()

    # ---- join trace events with HLO metadata ----------------------------
    # the per-op metadata lives in the compiled module text
    with pred._trace_ctx():
        lowered = jax.jit(pred._raw_fwd).lower(pred.variables, xs)
    hlo = lowered.compile().as_text()
    op_meta = {}
    for m in re.finditer(r"%?([\w.\-]+) = [^\n]*metadata=\{op_name=\"([^\"]+)\"", hlo):
        op_meta[m.group(1)] = m.group(2)

    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        raise SystemExit(f"no trace file under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    # device-lane complete events: name == fusion/op name, dur in us
    durs = collections.Counter()
    counts = collections.Counter()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # TPU op lanes have 'run_id'/correlation args; host lanes we skip by
        # requiring the op name to appear in the HLO module
        name = ev.get("name", "")
        base = name.split(".orig")[0]
        if base in op_meta or re.match(r"^(fusion|convolution|copy|custom-call|"
                                       r"all-reduce|bitcast|transpose)", base):
            durs[base] += ev["dur"]
            counts[base] += 1

    total = sum(durs.values())
    by_region = collections.Counter()
    lines = []
    lines.append(f"batch={batch} total traced device-op time: {total/1000:.1f} ms "
                 f"over 3 calls ({total/3000:.1f} ms/call)")
    lines.append(f"{'op':<40}{'ms/call':>10}{'%':>7}  region/op_name")
    for name, d in durs.most_common(25):
        meta = op_meta.get(name, "")
        reg = region_of(meta or name)
        by_region[reg] += d
        lines.append(f"{name[:40]:<40}{d/3000:>10.2f}{100*d/total:>6.1f}%  {reg} {meta[:60]}")
    for name, d in durs.items():
        if name not in dict(durs.most_common(25)):
            by_region[region_of(op_meta.get(name, "") or name)] += d
    lines.append("\nby region (ms/call):")
    for reg, d in by_region.most_common():
        lines.append(f"  {reg:<20}{d/3000:>8.2f}  {100*d/total:.1f}%")

    out = "\n".join(lines)
    print(out)
    with open(os.path.join(here, "profile_int8.txt"), "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
