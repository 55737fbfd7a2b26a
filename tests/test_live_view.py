"""Live-viewer host loop (tools/live_view.py): the solve/render loop runs
headless (null viewer) and actually balances the pendulum — covering the
last reference capability (the GLFW live loop, cmd/basic.cpp:158-179)
modulo the physical window."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.live_view import _NullViewer, live_loop  # noqa: E402


def test_live_loop_headless_balances():
    hist = live_loop("pendulum", frames=40, fps=0.0, headless=True,
                     horizon=16, iterations=4)
    assert hist.shape == (40, 2)
    assert np.all(np.isfinite(hist))
    assert np.abs(hist[:, 1]).max() < 0.1     # pole stays upright


def test_live_loop_early_exit():
    """The loop honors the viewer's is_running() (window close)."""
    import tools.live_view as lv

    class OneFrame(_NullViewer):
        def __init__(self):
            self.n = 0

        def is_running(self):
            self.n += 1
            return self.n <= 2

    orig = lv._make_viewer
    lv._make_viewer = lambda *a: (OneFrame(), None, None)
    try:
        hist = live_loop("pendulum", frames=40, fps=0.0, headless=False,
                         horizon=16, iterations=4)
    finally:
        lv._make_viewer = orig
    assert len(hist) == 2
