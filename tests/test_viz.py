"""Smoke tests: every plot function renders and saves headlessly."""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")

from openpystruct_tpu.viz import (
    plot_beam_diagrams,
    plot_beam_prediction,
    plot_frame,
    plot_loss_history,
    plot_pinn_fields,
    plot_train_val_losses,
)


def test_all_plots_render(tmp_path):
    rng = np.random.default_rng(0)
    n = 21
    node_x = np.linspace(0, 40, n)
    I = rng.uniform(0.1, 1.0, n - 1)

    figs = [
        plot_loss_history(
            np.vstack([np.linspace(10, 1, 50)] * 4).T
        ),
        plot_train_val_losses(np.linspace(1, 0.1, 20),
                              np.linspace(1.2, 0.2, 20)),
        plot_beam_diagrams(
            node_x, I, rng.normal(0, 1e4, n - 1), rng.normal(0, 1e5, n - 1),
            roller_idx=(5, 15), force_idx=(8,), force_values=(-1e5,),
        ),
        plot_beam_prediction(
            40.0, I, rollers_x=(10.0, 30.0),
            force_cases_x=[[5.0, 20.0], [12.0]],
            force_cases_vals=[[-1e5, -2e5], [-5e4]],
        ),
        plot_pinn_fields(node_x, I, rng.normal(0, 1e-3, n),
                         rng.normal(0, 1e-4, n)),
    ]

    from openpystruct_tpu.config import FrameConfig
    from openpystruct_tpu.fem import build_frame

    st = build_frame(2, 2, FrameConfig())
    figs.append(plot_frame(st, rng.uniform(1e-4, 1e-3, st.num_elems)))

    for i, fig in enumerate(figs):
        out = tmp_path / f"fig{i}.png"
        fig.savefig(out)
        assert out.stat().st_size > 1000


def test_live_loss_plot(tmp_path):
    """Headless live plot: each update atomically rewrites the PNG
    (the reference's plt.ion live_plot, FNN_MultiCase.py:493-515,594)."""
    from openpystruct_tpu.viz import LiveLossPlot

    path = str(tmp_path / "live.png")
    lp = LiveLossPlot(path)
    lp.update([1.0], [1.2])
    import os

    assert os.path.exists(path)
    size1 = os.path.getsize(path)
    lp.update([1.0, 0.8, 0.6], [1.2, 0.9, 0.7])
    assert os.path.getsize(path) > 0 and os.path.getsize(path) != 0
    lp.close()
    assert size1 > 1000  # a real PNG, not a stub


def test_live_plot_every_throttle(tmp_path):
    from openpystruct_tpu.viz import LiveLossPlot

    path = str(tmp_path / "live.png")
    lp = LiveLossPlot(path, every=5)
    for i in range(4):
        lp.update([1.0] * (i + 1), [1.0] * (i + 1))
    import os

    assert not os.path.exists(path)  # throttled
    lp.update([1.0] * 5, [1.0] * 5)
    assert os.path.exists(path)
    lp.close()


def test_plot_pinn_panels(tmp_path):
    """The PINN 3-panel prediction figure renders headlessly
    (OpenPyStruct_PINN_MultiCase.py:1021-1146)."""
    import numpy as np

    from openpystruct_tpu.viz import plot_pinn_panels

    nelem = 100
    rng = np.random.default_rng(0)
    pred_I = np.abs(rng.normal(0.5, 0.1, nelem))
    defl = -np.abs(rng.normal(0.0, 0.01, nelem + 1))
    rot = rng.normal(0.0, 0.005, nelem + 1)
    fig = plot_pinn_panels(
        200.0, pred_I, defl, rot,
        rollers_x=[18.0, 58.0, 138.0, 170.0, 200.0],
        force_cases_x=[[40.0, 90.0], [120.0]],
        force_cases_vals=[[-3e5, -1e5], [-2e5]],
    )
    assert len(fig.axes) >= 3  # 3 panels + colorbar axis
    out = tmp_path / "pinn_panels.png"
    fig.savefig(out)
    assert out.stat().st_size > 10_000
    import matplotlib.pyplot as plt

    plt.close(fig)
