"""Localize the on-device butterfly-merge accuracy gap.

Runs the SAME small golden-derived voting workload with the butterfly and
flat merges, on the current backend (device or CPU interpret), and dumps
the DSIs to npz for cross-backend comparison.

Usage:
  python scripts/bf_divergence_probe.py out_dev.npz          # on device
  JAX_PLATFORMS= python -c "import jax; ..."                 # via --cpu
  python scripts/bf_divergence_probe.py out_cpu.npz --cpu
  python scripts/bf_divergence_probe.py --compare out_dev.npz out_cpu.npz
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_EV = 131072


def run(out_path: str):
    import jax

    from dvs_mcemvs_tpu import pipeline
    from dvs_mcemvs_tpu.utils import golden

    mappers, events, trajs, scene, ts_rv = golden.build_golden_fixture()
    events = [e.slice(0, N_EV) for e in events]
    out = {}
    for tag, spec in [("bf", "hist:g8,seg16,bf,pl"),
                      ("flat", "hist:g8,seg16,pl")]:
        vopts = pipeline.VotingOptions(packet_size=1024, backend=spec,
                                       pad_policy="bucket")
        res = pipeline.process_1(mappers, events, trajs, ts_rv,
                                 stereo_fusion=2, vopts=vopts)
        out[tag] = np.asarray(res.dsis["camera0"], np.float32)
        print(f"{tag}: mass={out[tag].sum():.1f}", flush=True)
    np.savez_compressed(out_path, device=jax.default_backend(), **out)


def compare(a_path: str, b_path: str):
    a, b = np.load(a_path), np.load(b_path)
    print(f"A={a['device']} B={b['device']}")
    for tag in ("bf", "flat"):
        x, y = a[tag].astype(np.float64), b[tag].astype(np.float64)
        rel = np.abs(x - y).sum() / max(y.sum(), 1e-9)
        am = (x.argmax(0) == y.argmax(0)).mean()
        print(f"{tag:5s}: A-vs-B rel-L1 {rel:.4f}  argmax agree {am:.4f}  "
              f"mass A {x.sum():.1f} B {y.sum():.1f}")
    for src in (a, b):
        x, y = src["bf"].astype(np.float64), src["flat"].astype(np.float64)
        rel = np.abs(x - y).sum() / max(y.sum(), 1e-9)
        am = (x.argmax(0) == y.argmax(0)).mean()
        print(f"{src['device']}: bf-vs-flat rel-L1 {rel:.4f}  "
              f"argmax agree {am:.4f}")
    # Per-plane mass profile of the bf delta (where does bf lose/move mass?)
    d = a["bf"].astype(np.float64) - b["bf"].astype(np.float64)
    pm = np.abs(d).sum(axis=(1, 2))
    top = np.argsort(pm)[-6:][::-1]
    print("bf delta planes (top |mass|):", [(int(i), round(float(pm[i]), 1))
                                            for i in top])


def main():
    if sys.argv[1] == "--compare":
        compare(sys.argv[2], sys.argv[3])
        return
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    run(sys.argv[1])


if __name__ == "__main__":
    main()
