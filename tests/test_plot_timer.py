"""Tests for the presentation/dev-tool surface: plot_multi_axis layout
rules (reference: tests/test_plot.py:30-54 — the four
axis_locations × colored combinations) and estimate_time
(reference: pd_utils/timer.py:6-45).

matplotlib is absent from this runtime, so the render-path tests are
import-gated; the layout RULES (legend labels, ordinal suffixes) are
pure functions tested unconditionally, and the render tests execute
wherever matplotlib exists.
"""

from __future__ import annotations

import datetime
import timeit

import pytest

from pd_utils_spark.plot import axis_legend_labels, plot_multi_axis
from pd_utils_spark.timer import estimate_time


# ---------------------------------------------------------------- timer


def test_estimate_time_eta_arithmetic():
    # Simulate: loop started 10s ago, finished 5 of 10 iterations
    # (i=4) -> avg 2 s/iter, 5 left -> ETA ~10 s from now.
    start = timeit.default_timer() - 10.0
    before = datetime.datetime.now()
    eta = estimate_time(10, 4, start, output=False)
    after = datetime.datetime.now()
    lo = before + datetime.timedelta(seconds=9.5)
    hi = after + datetime.timedelta(seconds=10.5)
    assert lo <= eta <= hi


def test_estimate_time_last_iteration_is_now():
    start = timeit.default_timer() - 4.0
    eta = estimate_time(4, 3, start, output=False)
    assert abs((eta - datetime.datetime.now()).total_seconds()) < 0.5


def test_estimate_time_prints_progress(capsys):
    start = timeit.default_timer() - 1.0
    estimate_time(4, 1, start)
    out = capsys.readouterr().out
    assert "Completed 1/4" in out and "(25%)" in out


# ------------------------------------------------- plot layout rules


def test_axis_legend_labels_match_reference_rename_rule():
    # reference pd_utils/plot.py:37-51: first series '(left)', every
    # later one '(right, <ordinal i>)'.
    assert axis_legend_labels(["RET", "weight", "third"]) == [
        "RET (left)",
        "weight (right, 1st)",
        "third (right, 2nd)",
    ]


def test_axis_legend_labels_ordinals_past_ten():
    cols = [f"c{i}" for i in range(13)]
    labels = axis_legend_labels(cols)
    assert labels[11] == "c11 (right, 11th)"
    assert labels[12] == "c12 (right, 12th)"


def test_axis_legend_labels_disabled_passthrough():
    cols = ["a", "b"]
    assert axis_legend_labels(cols, axis_locations_in_legend=False) == cols


# ------------------------------------------------------- render path

# The reference's golden-image matrix (tests/test_plot.py:30-33).
RENDER_CASES = [(False, False), (False, True), (True, False), (True, True)]


@pytest.fixture()
def plot_df(spark):
    rows = [
        (i, 0.1 * i, 2.0 + 0.05 * i, 1.0 + 0.2 * i) for i in range(12)
    ]
    return spark.createDataFrame(rows, "t int, RET double, weight double, third double")


@pytest.mark.parametrize("axis_locations, colored", RENDER_CASES)
def test_multi_axis_plot_structure(plot_df, axis_locations, colored):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plot_multi_axis(
        plot_df,
        cols=["RET", "weight", "third"],
        axis_locations_in_legend=axis_locations,
        colored_axes=colored,
    )
    try:
        assert len(axes) == 3  # one host + two twinned y-axes
        assert [ax.get_ylabel() for ax in axes] == ["RET", "weight", "third"]
        legend_texts = [t.get_text() for t in axes[0].get_legend().get_texts()]
        expect = axis_legend_labels(["RET", "weight", "third"], axis_locations)
        assert legend_texts == expect
        host_color = axes[0].yaxis.label.get_color()
        if colored:
            assert host_color == matplotlib.pyplot.get_cmap("tab10")(0)
        else:
            assert host_color in ("black", (0, 0, 0, 1))
    finally:
        plt.close(fig)


def test_multi_axis_plot_png_deterministic(plot_df, tmp_path):
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    contents = []
    for i in range(2):
        fig, _ = plot_multi_axis(plot_df, cols=["RET", "weight"])
        p = tmp_path / f"render_{i}.png"
        fig.savefig(p, format="png", metadata={"Software": None})
        plt.close(fig)
        contents.append(p.read_bytes())
    assert contents[0] == contents[1] and len(contents[0]) > 1000


def test_plot_requires_matplotlib_or_raises(plot_df):
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib installed; guidance path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="matplotlib"):
        plot_multi_axis(plot_df, cols=["RET"])


def test_plot_empty_cols_raises(plot_df):
    pytest.importorskip("matplotlib")
    with pytest.raises(ValueError, match="empty list"):
        plot_multi_axis(plot_df, cols=[])
