#!/usr/bin/env python
"""Measured PyTorch-reference baseline on CPU (BASELINE.md anchor task #1).

No CUDA GPU exists in this environment, so the one *measurable* torch number
is the reference inference path on CPU: flowNetF -> warpNet -> netG -> gf128
(reference test_ffwm.py:62-67 / models/ffwm_model.py:183-189), instantiated
from /root/reference's own modules with random weights (throughput does not
depend on weight values). Together with the published FLOP count
(107.9 GFLOP/img from XLA cost analysis) and the device's peak FLOP/s this
bounds the V100 estimate in BASELINE.md: the V100 anchor is
107.9 GFLOP x measured-utilization scaling, and torch-CPU gives the measured
utilization of the exact reference graph under torch's scheduler.

Prints one JSON line: {"torch_cpu_img_s": ..., "batch": ..., "threads": ...}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402


def main():
    torch.set_num_threads(4)  # the reference's own setting (train_ffwm.py:59)
    from models.base_networks import FFWM, FlowNet, WarpNet  # noqa: E402
    from models.external_function import GuidedFilter  # noqa: E402

    flownet = FlowNet(64).eval()
    netg = FFWM(sn=True).eval()
    warp = WarpNet().eval()
    gf = GuidedFilter(32)  # reference ffwm_model.py:56

    results = {}
    with torch.no_grad():
        for batch in (1, 8):
            img_s = torch.rand(batch, 3, 128, 128)
            img_f = torch.rand(batch, 3, 128, 128)

            def step():
                # exactly test_forward (models/ffwm_model.py:183-189)
                flow128, flow64, flow32 = flownet(img_s)
                _ = warp(img_s, flow128)
                _, _, fake128, att = netg(
                    img_s, [flow32, flow64, flow128], return_att=True)
                return gf(fake128, img_f)

            step()  # warm caches
            n, t0 = 0, time.perf_counter()
            while time.perf_counter() - t0 < 10.0:
                step()
                n += batch
            dt = time.perf_counter() - t0
            results[batch] = n / dt
            print(f"# torch-cpu b={batch}: {n / dt:.2f} img/s", file=sys.stderr)

    best_b = max(results, key=results.get)
    print(json.dumps({
        "torch_cpu_img_s": round(results[best_b], 2),
        "batch": best_b,
        "per_batch": {str(k): round(v, 2) for k, v in results.items()},
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
