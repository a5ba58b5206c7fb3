"""Plotting parity layer — the reference's ``Plotter`` / ``DiffPlotter`` /
``BarPlot`` surface (``metrique/plotting.py:52-329``) re-expressed with the
series-shaping logic separated from the matplotlib calls.

Two layers:

- **Shaping** (always available, unit-testable without matplotlib): color
  resolution, stacked running sums and fill bands, auto-diff series,
  vertical event lines, bar x-offsets and tick labels. Every draw is
  recorded as a plain dict in ``.ops`` — the exact data matplotlib would
  be handed.
- **Rendering** (gated on matplotlib, absent in this container): a
  ``render()`` call replays ``.ops`` onto a figure. Construction never
  requires matplotlib — only ``render()`` / ``savefig()`` do.

Spark boundary: series arguments accept pandas Series OR a 2-column Spark
DataFrame (index col, value col) which is collected via ``toPandas`` —
plotting is inherently a driver-side operation over already-aggregated
(small) results; nothing here runs per-row on the cluster.
"""

from __future__ import annotations

import datetime

import pandas as pd

try:  # pragma: no cover - matplotlib absent in this container
    from matplotlib import pyplot as plt

    HAS_MATPLOTLIB = True
except Exception:  # pragma: no cover
    HAS_MATPLOTLIB = False

# matplotlib's standard tab10 categorical cycle + its pastel variants
# (the same defaults the reference pins, plotting.py:27-30)
COLORS = ['#1f77b4', '#ff7f0e', '#2ca02c', '#d62728', '#9467bd',
          '#8c564b', '#e377c2', '#7f7f7f', '#bcbd22', '#17becf']
ALPHAS = ['#aec7e8', '#ffbb78', '#98df8a', '#ff9896', '#c5b0d5',
          '#c49c94', '#f7b6d2', '#c7c7c7', '#dbdb8d', '#9edae5']
CNAMES = {'blue': 0, 'b': 0, 'orange': 1, 'green': 2, 'g': 2,
          'red': 3, 'r': 3, 'violet': 4, 'brown': 5, 'pink': 6,
          'grey': 7, 'khaki': 8, 'y': 8, 'cyan': 9}


def _as_series(series, index_col=None, value_col=None) -> pd.Series:
    """Accept a pandas Series or a small Spark DataFrame (collected here —
    the one place the plotting layer crosses the driver boundary)."""
    if hasattr(series, "toPandas"):
        pdf = series.toPandas()
        if index_col is None:
            index_col, value_col = pdf.columns[0], pdf.columns[-1]
        return pdf.set_index(index_col)[value_col]
    return pd.Series(series) if not isinstance(series, pd.Series) else series


class _ColorCycle:
    """Reference color resolution (``plotting.py:81-95``): explicit index,
    named color, or auto-advancing counter, wrapping at the palette."""

    def __init__(self):
        self.counter = 0

    def resolve(self, color) -> int:
        if color is None:
            color = self.counter
        if isinstance(color, str):
            color = CNAMES[color]
        self.counter = color + 1
        return color % len(COLORS)


class Plotter:
    """Stacked/overlaid series plots (reference ``Plotter``,
    ``plotting.py:52-183``). Draw data accumulates in ``.ops``; call
    ``render()`` (matplotlib required) to materialize a figure."""

    def __init__(self, figsize=(10, 6), stacked: bool = True, title: str = "",
                 stamp=True, **kwargs):
        self.figsize = figsize
        self.stacked = stacked
        self.title = title
        self.stamp = stamp
        self.running_sum = 0
        self._cycle = _ColorCycle()
        self.ops: list[dict] = []
        if stamp:
            t = str(datetime.datetime.now(datetime.timezone.utc)
                    .replace(tzinfo=None)).split(".")[0][:-3]
            text = f"{stamp} {t}" if isinstance(stamp, str) else t
            self.ops.append({"op": "stamp", "text": text})

    # -- shaping ----------------------------------------------------------
    def plot(self, series, label: str = "", color=None, style=None,
             index_col=None, value_col=None):
        """Add one series. When stacked, the drawn line is the running sum
        and a fill band covers [previous running sum, new running sum]."""
        s = _as_series(series, index_col, value_col).astype("float64")
        ci = self._cycle.resolve(color)
        if self.stacked:
            top = s + self.running_sum
            self.ops.append({
                "op": "fill_between", "index": top.index,
                "bottom": (pd.Series(self.running_sum, index=top.index)
                           if not isinstance(self.running_sum, pd.Series)
                           else self.running_sum),
                "top": top, "facecolor": ALPHAS[ci],
            })
            self.running_sum = top
            self.ops.append({"op": "ylim", "bottom": 0,
                             "top": int(top.max() * 1.05)})
            drawn = top
        else:
            drawn = s
        self.ops.append({"op": "line_series", "series": drawn,
                         "label": label, "color": COLORS[ci],
                         "style": style, "linewidth": 2})
        return drawn

    def plots(self, series_list, label_list, colors=None):
        colors = colors if colors is not None else range(len(series_list))
        for s, label, color in zip(series_list, label_list, colors):
            self.plot(s, label=label, color=color)

    def line(self, x, label=None, y="bottom", color="grey", **kwargs):
        """Vertical event line with an optional rotated label."""
        self.ops.append({"op": "vline", "x": x, "label": label, "y": y,
                         "color": color, **kwargs})

    def lines(self, lines_dict, y="bottom", color="grey", **kwargs):
        for label, x in lines_dict.items():
            self.line(x, label, y=y, color=color, **kwargs)

    def legend(self, **kwargs):
        self.ops.append({"op": "legend", **kwargs})

    # -- rendering --------------------------------------------------------
    def _require_mpl(self):
        if not HAS_MATPLOTLIB:
            raise RuntimeError("`pip install matplotlib` required")

    def render(self):
        """Replay ``.ops`` onto a fresh matplotlib figure."""
        self._require_mpl()
        fig, ax = plt.subplots(figsize=self.figsize)
        if self.title:
            ax.set_title(self.title)
        self._replay(fig, ax, self.ops)
        return fig

    def _replay(self, fig, ax, ops):  # pragma: no cover - needs matplotlib
        for op in ops:
            kind = op["op"]
            if kind == "stamp":
                fig.text(0.95, 0.05, op["text"], fontsize=12, color="gray",
                         ha="right", va="bottom", alpha=0.5)
            elif kind == "fill_between":
                ax.fill_between(op["index"], op["bottom"], op["top"],
                                facecolor=op["facecolor"])
            elif kind == "ylim":
                ax.set_ylim(bottom=op["bottom"], top=op["top"])
            elif kind == "line_series":
                op["series"].plot(ax=ax, label=op["label"], c=op["color"],
                                  linewidth=op["linewidth"],
                                  style=op["style"])
            elif kind == "vline":
                ax.axvline(op["x"], color=op["color"])
                if op.get("label"):
                    y0, y1 = ax.get_ylim()
                    y = op["y"]
                    va = "bottom"
                    if y == "bottom":
                        y = y0 + (y1 - y0) / 25.0
                    elif y == "top":
                        va = "top"
                        y = y0 + (y1 - y0) * 24 / 25.0
                    ax.annotate("\n" + op["label"], (op["x"], y),
                                rotation=90, verticalalignment=va)
            elif kind == "legend":
                ax.legend(**{k: v for k, v in op.items() if k != "op"})

    def savefig(self, path, **kwargs):  # pragma: no cover
        self.render().savefig(path, **kwargs)


class DiffPlotter(Plotter):
    """Two-panel plot: series on top, their period-over-period diffs below
    (reference ``DiffPlotter``, ``plotting.py:186-266``). ``autodiffs``
    computes ``series.diff()`` when no explicit diff is given."""

    def __init__(self, figsize=(10, 7), stacked=True, title="", stamp=True,
                 autodiffs: bool = True, **kwargs):
        super().__init__(figsize=figsize, stacked=stacked, title=title,
                         stamp=stamp, **kwargs)
        self.autodiffs = autodiffs
        self.diff_ops: list[dict] = []

    def plot(self, series, series_diff=None, label="", color=None,
             style=None, index_col=None, value_col=None):
        s = _as_series(series, index_col, value_col).astype("float64")
        if series_diff is None and self.autodiffs:
            series_diff = s.diff()
        drawn = super().plot(s, label=label, color=color, style=style)
        if series_diff is not None:
            d = _as_series(series_diff)
            # color already advanced by super().plot — reuse its index
            ci = (self._cycle.counter - 1) % len(COLORS)
            self.diff_ops.append({"op": "line_series", "series": d,
                                  "label": label, "color": COLORS[ci],
                                  "style": style, "linewidth": 2})
        return drawn

    def line(self, x, label=None, y="bottom", color="grey", **kwargs):
        super().line(x, label, y=y, color=color, **kwargs)
        self.diff_ops.append({"op": "vline", "x": x, "label": "", "y": 0,
                              "color": color, **kwargs})

    def render(self):  # pragma: no cover - needs matplotlib
        self._require_mpl()
        fig = plt.figure(figsize=self.figsize)
        ax1 = plt.subplot2grid((4, 1), (0, 0), rowspan=3)
        if self.title:
            ax1.set_title(self.title)
        plt.setp(ax1.get_xticklabels(), visible=False)
        ax2 = plt.subplot2grid((4, 1), (3, 0), sharex=ax1)
        plt.subplots_adjust(hspace=0.15)
        self._replay(fig, ax1, self.ops)
        self._replay(fig, ax2, self.diff_ops)
        return fig


class BarPlot:
    """Line-over-bars dual-axis plot (reference ``BarPlot``,
    ``plotting.py:269-329``): lines on the left axis, 0.4-offset bars on
    the right, shared categorical x ticks."""

    def __init__(self, title: str = "", figsize=(10, 5)):
        self.title = title
        self.figsize = figsize
        self._cycle = _ColorCycle()
        self.ops: list[dict] = []
        self.bar_lim((0, 100))

    def plot(self, series, label="", linewidth=3, marker="o", color=None,
             index_col=None, value_col=None):
        s = _as_series(series, index_col, value_col)
        ci = self._cycle.resolve(color)
        self.ops.append({"op": "axis1_line", "x": list(range(len(s))),
                         "values": s.to_numpy(), "label": label,
                         "linewidth": linewidth, "marker": marker,
                         "color": COLORS[ci]})

    def bar(self, series, label="", alpha=0.2, color=None,
            index_col=None, value_col=None):
        s = _as_series(series, index_col, value_col)
        ci = self._cycle.resolve(color)
        self.ops.append({"op": "axis2_bar",
                         "x": [v - 0.4 for v in range(len(s))],
                         "values": s.to_numpy(), "label": label,
                         "alpha": alpha, "color": COLORS[ci]})

    def plot_label(self, label):
        self.ops.append({"op": "axis1_ylabel", "label": label})

    def plot_lim(self, lim):
        ymin, ymax = lim
        self.ops.append({"op": "axis1_ylim", "ymin": ymin, "ymax": ymax})

    def bar_label(self, label):
        self.ops.append({"op": "axis2_ylabel", "label": label})

    def bar_lim(self, lim):
        ymin, ymax = lim
        self.ops.append({"op": "axis2_ylim", "ymin": ymin, "ymax": ymax})

    def xticks(self, names):
        self.ops.append({"op": "xticks", "ticks": list(range(len(names))),
                         "names": list(names)})

    def xlabel(self, label):
        self.ops.append({"op": "xlabel", "label": label})

    def legend(self, **kwargs):
        self.ops.append({"op": "legend", **kwargs})

    def render(self):  # pragma: no cover - needs matplotlib
        if not HAS_MATPLOTLIB:
            raise RuntimeError("`pip install matplotlib` required")
        fig, ax1 = plt.subplots(figsize=self.figsize)
        ax2 = ax1.twinx()
        if self.title:
            ax1.set_title(self.title)
        for op in self.ops:
            kind = op["op"]
            if kind == "axis1_line":
                ax1.plot(op["x"], op["values"], label=op["label"],
                         linewidth=op["linewidth"], marker=op["marker"],
                         color=op["color"])
            elif kind == "axis2_bar":
                ax2.bar(op["x"], op["values"], label=op["label"],
                        alpha=op["alpha"], color=op["color"])
            elif kind == "axis1_ylabel":
                ax1.set_ylabel(op["label"])
            elif kind == "axis2_ylabel":
                ax2.set_ylabel(op["label"])
            elif kind == "axis1_ylim":
                ax1.set_ylim((op["ymin"], op["ymax"]))
            elif kind == "axis2_ylim":
                ax2.set_ylim((op["ymin"], op["ymax"]))
            elif kind == "xticks":
                ax1.set_xticks(op["ticks"])
                ax1.set_xticklabels(op["names"])
            elif kind == "xlabel":
                ax1.set_xlabel(op["label"])
            elif kind == "legend":
                l1, lab1 = ax1.get_legend_handles_labels()
                l2, lab2 = ax2.get_legend_handles_labels()
                ax1.legend(l1 + l2, lab1 + lab2,
                           **{k: v for k, v in op.items() if k != "op"})
        return fig
