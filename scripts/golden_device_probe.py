"""Score golden-fixture accuracy of backend spec variants on the DEVICE.

Diagnoses on-device vs interpret-mode accuracy gaps of the bf/pl specs
(MXU bf16 rounding, chained merge-level storage precision).

Usage: python scripts/golden_device_probe.py [spec ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

DEFAULT = [
    "hist:g8,seg16,bf,pl",
    "hist:g8,seg16,bf,pl,f32",
    "hist:g8,seg16,pl",
    "hist:g8,seg8,bf,pl",
    "hist:g8,seg16,bf,pl,i8",
]


def main():
    import jax

    from dvs_mcemvs_tpu import pipeline
    from dvs_mcemvs_tpu.mapper import get_depth_map
    from dvs_mcemvs_tpu.ops import extract
    from dvs_mcemvs_tpu.utils import golden

    specs = sys.argv[1:] or DEFAULT
    mappers, events, trajs, scene, ts_rv = golden.build_golden_fixture()
    g = np.load(golden.GOLDEN_NPZ)
    gi = np.asarray(g["depth_indices"]).astype(int)
    conf = np.asarray(g["confidence"])
    sel = conf > np.quantile(conf, golden.BUDGET["confident_quantile"])
    print(f"device={jax.default_backend()}", flush=True)

    for spec in specs:
        try:
            t0 = time.time()
            vopts = pipeline.VotingOptions(packet_size=1024, backend=spec,
                                           pad_policy="bucket")
            res = pipeline.process_1(mappers, events, trajs, ts_rv,
                                     stereo_fusion=2, vopts=vopts)
            dm = get_depth_map(mappers[0], res.fused_dsi,
                               extract.DepthMapOptions())
            hi = np.asarray(dm.depth_indices).astype(int)
            ei = np.abs(hi[sel] - gi[sel])
            m = np.asarray(dm.mask) > 0
            rel = float(np.median(
                np.abs(np.asarray(dm.depth)[m] - scene.gt_depth[m])
                / scene.gt_depth[m]))
            print(f"{spec:28s} within1={np.mean(ei <= 1):.4f} "
                  f"within2={np.mean(ei <= 2):.4f} "
                  f"med={np.median(ei):.1f} gt_rel={rel:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{spec:28s} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
