"""BatchServer (queue-depth-adaptive dynamic batcher) on the attached chip.

serve_latency.json showed B<=16 serving is dispatch-dominated on the relay
(~28 ms/call fixed overhead); ROADMAP r4 item 2 proposed a queue-depth-aware
aggregation depth k. This measures the server end-to-end (client thread ->
queue -> worker -> predict_many -> Future), per config:

  * unloaded_ms: median submit()->result() wall time for a lone request —
    the latency an interactive caller sees (one k=1 dispatch + padding +
    thread handoff overhead vs the raw predictor call).
  * saturated_img_s: wall-clock throughput pushing `n` requests through
    map() as fast as the client can submit — backlog builds, so the
    adaptive policy should climb to max(ks) and approach the aggregated-
    dispatch rate (int8_ab.json agg4) while ks=(1,) stays at per-call rate.

Measurement rules (relay): requests are (h,w,3) uint8 host arrays (the real
wire format — upload rides inside the timed region because that IS the
serving path, unlike the kernel-time artifacts); outputs are device->host
mask bytes. Appends JSON lines to benchmarks/batch_server.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import load_trained_variables, phantom_batch  # noqa: E402


def main() -> None:
    import numpy as np

    from octave_tpu.serve import BatchServer, Predictor

    hw = 304
    try:
        variables, weights = load_trained_variables()
        if variables is None:
            weights = "random"
    except Exception:
        variables = None
        weights = "random"

    def make(**kw):
        if variables is not None:
            return Predictor(variables, output_format="mask_u8", **kw)
        return Predictor.initialize(image_hw=(hw, hw), output_format="mask_u8", **kw)

    calib = [phantom_batch(16, hw)]
    pred = make(int8_decoder=True, calibration_batches=calib,
                dense_groups="decoder", int8_prepack=True)

    imgs = (phantom_batch(64, hw) * 255).astype(np.uint8)
    here = os.path.dirname(os.path.abspath(__file__))
    out = open(os.path.join(here, "batch_server.json"), "a")

    depth = int(os.environ.get("BS_PIPELINE", "2"))
    configs = ((16, (1,)), (16, (1, 2, 4)), (64, (1,)), (64, (1, 2, 4)))
    if os.environ.get("BS_ONLY"):  # e.g. BS_ONLY="64:1,2,4" — one config
        b, ks_s = os.environ["BS_ONLY"].split(":")
        configs = ((int(b), tuple(int(k) for k in ks_s.split(","))),)
    for batch, ks in configs:
        srv = BatchServer(pred, batch=batch, image_hw=(hw, hw), ks=ks,
                          pipeline_depth=depth)

        # -- unloaded latency: one lone request at a time ---------------
        lat = []
        for i in range(20):
            t0 = time.perf_counter()
            srv.submit(imgs[i % 64]).result()
            lat.append(time.perf_counter() - t0)
        unloaded_ms = statistics.median(lat[5:]) * 1e3

        # -- saturated throughput: flood map() --------------------------
        n = 1024
        stream = (imgs[i % 64] for i in range(n))
        t0 = time.perf_counter()
        got = sum(1 for _ in srv.map(stream))
        wall = time.perf_counter() - t0
        assert got == n
        srv.close()

        row = {
            "weights": weights, "batch": batch, "ks": list(ks),
            "pipeline_depth": depth,
            "unloaded_ms": round(unloaded_ms, 3),
            "saturated_img_s": round(n / wall, 1),
        }
        if srv.ks != srv.ks_requested:  # HBM budget dropped depths upfront
            row["ks_capped"] = list(srv.ks)
        if srv._ks_live != srv.ks:  # device OOM shrank the live depths
            row["ks_live_after_oom"] = list(srv._ks_live)
        print(json.dumps(row))
        out.write(json.dumps(row) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
