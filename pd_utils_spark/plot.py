"""Presentation helpers (driver-side, not engine operators).

Spark-native disposition of the reference's plot module
(reference: pd_utils/plot.py:11-83): the engine's job is to reduce
the frame to a plottable size; rendering happens driver-side with
matplotlib when available. SURVEY.md §2.12.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame


def _ordinal(n: int) -> str:
    """1 -> '1st', 2 -> '2nd', ... (reference: pd_utils/plot.py:9)."""
    return "%d%s" % (n, "tsnrhtdd"[(n // 10 % 10 != 1) * (n % 10 < 4) * n % 10 :: 4])


def axis_legend_labels(
    cols: List[str], axis_locations_in_legend: bool = True
) -> List[str]:
    """Legend labels with which-axis annotations, matching the
    reference's rename logic (reference: pd_utils/plot.py:37-51):
    the first series is '(left)', the second '(right)', later ones
    '(right, 1st)', '(right, 2nd)', ... Pure function so the layout
    rule is testable without matplotlib."""
    if not axis_locations_in_legend:
        return list(cols)
    labels = []
    for i, col in enumerate(cols):
        position = "left" if i == 0 else f"right, {_ordinal(i)}"
        labels.append(f"{col} ({position})")
    return labels


def plot_multi_axis(
    df: DataFrame,
    cols: Optional[List[str]] = None,
    spacing: float = 0.1,
    colored_axes: bool = True,
    axis_locations_in_legend: bool = True,
    legend_kwargs: Optional[Dict[str, Any]] = None,
    xcol: Optional[str] = None,
    limit: int = 10_000,
    **plot_kwargs,
) -> Tuple[Any, List[Any]]:
    """Multi-y-axis line plot of ``cols`` (default: all numeric
    columns), one twinned axis per series with color-matched ticks and
    a combined legend — the reference's layout and parameter surface
    (pd_utils/plot.py:11-83: spacing, colored_axes,
    axis_locations_in_legend, legend_kwargs). The DataFrame is reduced
    driver-side via ``limit(n).toPandas()``; at scale
    aggregate/downsample FIRST (the limit guards against accidental
    full collects, it is not a sampler).

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
    cols = list(cols) if cols is not None else [
        c for c in numeric_cols(df) if c != xcol
    ]
    if len(cols) == 0:
        raise ValueError("if cols are passed, must not be an empty list")
    labels = axis_legend_labels(cols, axis_locations_in_legend)
    legend_kwargs = legend_kwargs or {}
    x = pdf[xcol] if xcol else pdf.index

    fig, host = plt.subplots()
    axes = [host]
    cmap = plt.get_cmap("tab10")
    lines = []
    for i, c in enumerate(cols):
        ax = host if i == 0 else host.twinx()
        if i >= 2:
            # extra right spines pushed outward, reference spacing rule
            # (pd_utils/plot.py:71): position = 1 + spacing * (n - 1)
            ax.spines["right"].set_position(("axes", 1 + spacing * (i - 1)))
        color = cmap(i % 10)
        (ln,) = ax.plot(x, pdf[c], color=color, label=labels[i], **plot_kwargs)
        ax.set_ylabel(c)
        if colored_axes:
            ax.yaxis.label.set_color(color)
            ax.tick_params(axis="y", colors=color)
        lines.append(ln)
        if i > 0:
            axes.append(ax)
    host.legend(lines, labels, **legend_kwargs)
    return fig, axes
