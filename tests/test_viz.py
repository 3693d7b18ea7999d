"""The DSI viewers must render all three modes headlessly (the volume mode
is the matplotlib stand-in for the reference's visvis volume renderer,
mapper_emvs_stereo/scripts/visualize_dsi_volume.py)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def viz():
    import matplotlib

    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location(
        "visualize_dsi", os.path.join(REPO, "scripts", "visualize_dsi.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["visualize_dsi"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def dsi():
    rng = np.random.default_rng(7)
    d = rng.random((16, 32, 40)).astype(np.float32)
    d[8, 10:20, 15:25] += 5.0  # a bright surface the volume mode must keep
    return d


def test_all_modes_render(viz, dsi, tmp_path):
    import matplotlib.pyplot as plt

    for fig in (viz.plot_slices(dsi), viz.plot_mip(dsi),
                viz.plot_volume(dsi, quantile=0.98, max_points=2000)):
        out = tmp_path / "fig.png"
        fig.savefig(out)
        assert out.stat().st_size > 0
        plt.close(fig)


def test_volume_empty_threshold_exits(viz):
    with pytest.raises(SystemExit):
        viz.plot_volume(np.zeros((4, 4, 4), np.float32), quantile=0.99)
