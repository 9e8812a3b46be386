"""GUI smoke tests. A real Tk session needs a display; headless CI checks
that the module imports, its logic helpers work, and — when a display is
available — that the full widget tree builds."""
import os

import pytest


def test_gui_module_imports():
    import small_fem_solver_tpu.gui as gui
    assert hasattr(gui, "JacketGUI")
    assert "COORDINATE SYSTEM" in gui.INFO_TEXT


@pytest.mark.skipif(not os.environ.get("DISPLAY"),
                    reason="no X display available")
def test_gui_builds_widget_tree():
    import tkinter as tk

    import small_fem_solver_tpu.gui as gui
    root = tk.Tk()
    try:
        app = gui.JacketGUI(root)
        assert len(app.nodes_data) == 21
        assert len(app.members_data) == 51
        p = app._params()
        assert p["H"] == 17.038
        model = app._build_model(p)
        assert model.n_members == 51
    finally:
        root.destroy()
