"""Series-shaping tests for the plotting parity layer — run WITHOUT
matplotlib: construction and shaping never touch it, only render()."""

import pandas as pd
import pytest

from metrique_spark.plotting import (ALPHAS, CNAMES, COLORS, BarPlot,
                                     DiffPlotter, Plotter, _ColorCycle)


def _series_ops(p):
    return [o for o in p.ops if o["op"] == "line_series"]


def test_color_cycle_resolution():
    c = _ColorCycle()
    assert c.resolve(None) == 0      # auto: counter
    assert c.resolve(None) == 1      # advanced
    assert c.resolve("red") == CNAMES["red"]
    assert c.resolve(None) == CNAMES["red"] + 1   # continues after named
    assert c.resolve(37) == 37 % len(COLORS)      # wraps at palette


def test_plotter_stacked_running_sum():
    p = Plotter(stacked=True, stamp=False)
    idx = pd.RangeIndex(3)
    a = pd.Series([1.0, 2.0, 3.0], index=idx)
    b = pd.Series([10.0, 10.0, 10.0], index=idx)
    drawn_a = p.plot(a, label="a")
    drawn_b = p.plot(b, label="b")
    # second series draws on top of the first's running sum
    assert list(drawn_a) == [1.0, 2.0, 3.0]
    assert list(drawn_b) == [11.0, 12.0, 13.0]
    fills = [o for o in p.ops if o["op"] == "fill_between"]
    assert len(fills) == 2
    # band 2 spans [a, a+b] with the second pastel
    assert list(fills[1]["bottom"]) == [1.0, 2.0, 3.0]
    assert list(fills[1]["top"]) == [11.0, 12.0, 13.0]
    assert fills[1]["facecolor"] == ALPHAS[1]
    # ylim tracks 105% of the stacked max
    assert [o for o in p.ops if o["op"] == "ylim"][-1]["top"] == int(13 * 1.05)


def test_plotter_unstacked_draws_raw():
    p = Plotter(stacked=False, stamp=False)
    s = pd.Series([5.0, 1.0])
    drawn = p.plot(s)
    assert list(drawn) == [5.0, 1.0]
    assert not [o for o in p.ops if o["op"] == "fill_between"]


def test_plotter_plots_and_lines():
    p = Plotter(stacked=False, stamp=False)
    p.plots([pd.Series([1.0]), pd.Series([2.0])], ["x", "y"])
    assert [o["label"] for o in _series_ops(p)] == ["x", "y"]
    assert [o["color"] for o in _series_ops(p)] == [COLORS[0], COLORS[1]]
    p.lines({"release": 7, "freeze": 9})
    vls = [o for o in p.ops if o["op"] == "vline"]
    assert {(o["label"], o["x"]) for o in vls} == {("release", 7),
                                                  ("freeze", 9)}


def test_plotter_stamp_op():
    p = Plotter(stamp="built")
    assert p.ops[0]["op"] == "stamp"
    assert p.ops[0]["text"].startswith("built ")


def test_diffplotter_autodiff():
    p = DiffPlotter(stacked=False, stamp=False)
    p.plot(pd.Series([1.0, 4.0, 9.0]), label="n")
    d = p.diff_ops[0]["series"]
    assert pd.isna(d.iloc[0]) and list(d.iloc[1:]) == [3.0, 5.0]
    # diff panel uses the same color as the top panel
    assert p.diff_ops[0]["color"] == _series_ops(p)[0]["color"]


def test_diffplotter_explicit_diff_and_line():
    p = DiffPlotter(stacked=False, stamp=False, autodiffs=False)
    p.plot(pd.Series([1.0, 2.0]), label="n")
    assert p.diff_ops == []          # autodiffs off, none given
    p.plot(pd.Series([1.0, 2.0]), series_diff=pd.Series([0.5, 0.5]))
    assert list(p.diff_ops[0]["series"]) == [0.5, 0.5]
    p.line(3, label="cut")
    # event line mirrors into both panels, label only on top
    assert [o for o in p.ops if o["op"] == "vline"][0]["label"] == "cut"
    assert [o for o in p.diff_ops if o["op"] == "vline"][0]["label"] == ""


def test_barplot_offsets_and_ticks():
    b = BarPlot()
    b.plot(pd.Series([50.0, 60.0]), label="pct")
    b.bar(pd.Series([5.0, 7.0]), label="n")
    line = [o for o in b.ops if o["op"] == "axis1_line"][0]
    bar = [o for o in b.ops if o["op"] == "axis2_bar"][0]
    assert line["x"] == [0, 1]
    assert bar["x"] == [-0.4, 0.6]               # reference's 0.4 shift
    b.xticks(["jan", "feb"])
    ticks = [o for o in b.ops if o["op"] == "xticks"][0]
    assert ticks["ticks"] == [0, 1] and ticks["names"] == ["jan", "feb"]
    # default right-axis percent limits
    lim = [o for o in b.ops if o["op"] == "axis2_ylim"][0]
    assert (lim["ymin"], lim["ymax"]) == (0, 100)


def test_spark_frame_boundary(spark):
    p = Plotter(stacked=False, stamp=False)
    df = spark.createDataFrame([("2024-01-01", 3), ("2024-01-02", 5)],
                               ["_date", "n"])
    drawn = p.plot(df.orderBy("_date"))
    assert list(drawn) == [3.0, 5.0]
    assert list(drawn.index) == ["2024-01-01", "2024-01-02"]


def test_render_gated_without_matplotlib():
    import metrique_spark.plotting as mod
    if mod.HAS_MATPLOTLIB:
        pytest.skip("matplotlib present; gate not exercised")
    with pytest.raises(RuntimeError, match="matplotlib"):
        Plotter(stamp=False).render()
    with pytest.raises(RuntimeError, match="matplotlib"):
        BarPlot().render()
