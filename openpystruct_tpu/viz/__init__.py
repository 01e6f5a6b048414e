"""Host-side matplotlib reporting (the reference's L5 layer)."""

from openpystruct_tpu.viz.plots import (
    LiveLossPlot,
    plot_loss_history,
    plot_train_val_losses,
    plot_beam_diagrams,
    plot_beam_prediction,
    plot_frame,
    plot_pinn_fields,
    plot_pinn_panels,
)

__all__ = [
    "LiveLossPlot",
    "plot_loss_history",
    "plot_train_val_losses",
    "plot_beam_diagrams",
    "plot_beam_prediction",
    "plot_frame",
    "plot_pinn_fields",
    "plot_pinn_panels",
]
