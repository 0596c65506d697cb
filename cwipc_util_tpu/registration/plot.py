"""Analysis plots: distance-distribution histograms per camera.

Re-implementation of the reference's plot module
(reference: python/cwipc/registration/plot.py:18-116): per-camera histogram
+ cumulative curves of the nearest-distance distributions, with the chosen
correspondence marked.  Uses the Agg backend so it works headless; shows
interactively when a display is available.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .abstract import AnalysisResults


def _get_plt():
    import matplotlib

    import os

    if not os.environ.get("DISPLAY"):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_analysis_results(
    results: List[AnalysisResults],
    filename: Optional[str] = None,
    title: str = "Registration analysis",
    cumulative: bool = True,
) -> None:
    """Histogram (and cumulative) of distances per camera, correspondence
    marked with a vertical line.  Saves to `filename` or shows the window."""
    plt = _get_plt()
    nplots = 2 if cumulative else 1
    fig, axes = plt.subplots(nplots, 1, figsize=(10, 4 * nplots), squeeze=False)
    ax = axes[0][0]
    for res in results:
        if res.histogram is None or res.histogramEdges is None:
            continue
        centers = (res.histogramEdges[:-1] + res.histogramEdges[1:]) / 2
        label = f"tile {res.tilemask}" if res.tilemask is not None else res.algorithm
        (line,) = ax.plot(centers, res.histogram, label=label)
        ax.axvline(res.minCorrespondence, color=line.get_color(), linestyle="--", alpha=0.6)
    ax.set_xlabel("distance (m)")
    ax.set_ylabel("point count")
    ax.set_title(title)
    ax.legend()
    if cumulative:
        ax2 = axes[1][0]
        for res in results:
            if res.histogram is None or res.histogramEdges is None:
                continue
            centers = (res.histogramEdges[:-1] + res.histogramEdges[1:]) / 2
            total = res.histogram.sum() or 1
            label = f"tile {res.tilemask}" if res.tilemask is not None else res.algorithm
            ax2.plot(centers, np.cumsum(res.histogram) / total, label=label)
        ax2.set_xlabel("distance (m)")
        ax2.set_ylabel("cumulative fraction")
        ax2.legend()
    fig.tight_layout()
    if filename:
        fig.savefig(filename)
    else:
        import matplotlib

        if matplotlib.get_backend().lower() == "agg":
            fig.savefig("registration_analysis.png")
            print("plot: saved registration_analysis.png (no display)")
        else:
            plt.show()
    plt.close(fig)
