"""Presentation helpers (driver-side, not engine operators).

Spark-native disposition of the reference's plot module
(reference: pd_utils/plot.py:11-83): the engine's job is to reduce
the frame to a plottable size; rendering happens driver-side with
matplotlib when available. SURVEY.md §2.12.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def plot_multi_axis(
    df: DataFrame,
    cols: Optional[list[str]] = None,
    xcol: Optional[str] = None,
    limit: int = 10_000,
    **subplots_kwargs,
):
    """Multi-y-axis line plot of ``cols`` (default: all numeric
    columns), one twinned axis per series with color-matched ticks and
    a combined legend — the reference's layout
    (pd_utils/plot.py:11-83). The DataFrame is reduced driver-side via
    ``limit(n).toPandas()``; at scale aggregate/downsample FIRST (the
    limit guards against accidental full collects, it is not a
    sampler).

    Requires matplotlib (not installed in every runtime — raises
    ImportError with guidance when missing). Returns (fig, axes).
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "plot_multi_axis needs matplotlib; install it or export the "
            "frame with .toPandas() and plot in your own environment"
        ) from e

    from pd_utils_spark.utils import numeric_cols

    pdf = df.limit(limit).toPandas()
    cols = cols or [c for c in numeric_cols(df) if c != xcol]
    x = pdf[xcol] if xcol else pdf.index

    fig, host = plt.subplots(**subplots_kwargs)
    axes = [host]
    cmap = plt.get_cmap("tab10")
    lines = []
    for i, c in enumerate(cols):
        ax = host if i == 0 else host.twinx()
        if i >= 2:  # offset extra right spines like the reference
            ax.spines["right"].set_position(("outward", 60 * (i - 1)))
        color = cmap(i % 10)
        (ln,) = ax.plot(x, pdf[c], color=color, label=c)
        ax.set_ylabel(c, color=color)
        ax.tick_params(axis="y", colors=color)
        lines.append(ln)
        if i > 0:
            axes.append(ax)
    host.legend(lines, [ln.get_label() for ln in lines], loc="best")
    return fig, axes
