import numpy as np
import pytest

from pbrt_tpu.core.filters import Filter, make_filter


def test_box_table():
    f = make_filter("box")
    t = f.table()
    assert t.shape == (16, 16)
    np.testing.assert_allclose(t, 1.0)


def test_gaussian_positive_decreasing():
    f = make_filter("gaussian")
    t = f.table()
    assert t[0, 0] > t[-1, -1]
    assert (t >= 0).all()


def test_mitchell_integrates_to_one():
    f = make_filter("mitchell")
    x = np.linspace(-f.xwidth, f.xwidth, 4001)
    v = f._mitchell_1d(x / f.xwidth)
    # pbrt's mitchell is normalized so that ∫ over [-w,w] of m(x/w)/ (2w)... the
    # 1D kernel integrates to ~1 over [-2,2] in normalized units
    integral = np.trapezoid(v, x / f.xwidth * 2.0)
    assert integral == pytest.approx(1.0, abs=0.01)


def test_triangle_zero_at_edge():
    f = make_filter("triangle")
    assert f.evaluate(2.0, 0.0) == pytest.approx(0.0)
    assert f.evaluate(0.0, 0.0) == pytest.approx(4.0)


def test_sinc_window():
    f = make_filter("sinc")
    assert f._sinc_1d(np.array(0.0)) == pytest.approx(1.0)
    assert f._sinc_1d(np.array(1.5)) == 0.0


def test_width_override():
    f = make_filter("gaussian", {"width": 3.0})
    assert f.xwidth == 3.0 and f.ywidth == 3.0
