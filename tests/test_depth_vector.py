import numpy as np
import pytest

from dvs_mcemvs_tpu.ops.depth_vector import DepthVector, LINEAR, INVERSE


def test_linear_matches_reference_formula():
    dv = DepthVector(LINEAR, 0.3, 5.0, 100)
    d = dv.depths()
    # Reference: vec[i] = min + i / (N / (max-min))  (depth_vector.hpp:87-96)
    mult = 100 / (5.0 - 0.3)
    np.testing.assert_allclose(d, 0.3 + np.arange(100) / mult, rtol=1e-6)
    assert d[0] == pytest.approx(0.3)
    # NOTE: reference spacing uses N (not N-1), so depths[-1] != max_depth.
    assert d[-1] < 5.0


def test_inverse_matches_reference_formula():
    dv = DepthVector(INVERSE, 0.3, 5.0, 100)
    d = dv.depths()
    mult = 100 / (1 / 0.3 - 1 / 5.0)
    np.testing.assert_allclose(1.0 / d, 1 / 5.0 + np.arange(100) / mult, rtol=1e-6)
    assert d[0] == pytest.approx(5.0)  # inverse vector starts at max depth


def test_roundtrip_index_depth():
    for kind in (LINEAR, INVERSE):
        dv = DepthVector(kind, 0.5, 10.0, 64)
        d = dv.depths()
        idx = np.asarray(dv.depth_to_cell_index(d))
        np.testing.assert_array_equal(idx, np.arange(64))


def test_swapped_min_max():
    dv = DepthVector(LINEAR, 5.0, 0.3, 10)
    assert dv.min_depth == 0.3 and dv.max_depth == 5.0


def test_depth_at_index_matches_table():
    """Closed-form index→depth ≡ the f32 table to ~1 ulp (the extraction
    chain uses the arithmetic form to avoid a TPU-slow table gather)."""
    for kind in (LINEAR, INVERSE):
        for lo, hi, n in [(0.5, 10.0, 64), (2.0, 40.0, 100), (4.0, 200.0, 256)]:
            dv = DepthVector(kind, lo, hi, n)
            table = dv.depths()
            arith = np.asarray(dv.depth_at_index(np.arange(n)))
            np.testing.assert_allclose(arith, table, rtol=3e-7)
