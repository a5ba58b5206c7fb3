"""Reporting / plotting shims — the reference's §2.9 surface as a thin
layer at the `.toPandas()` boundary.

Reference: ``metrique/reporting.py:30-109`` (linear HTML report builder
with chapters/sections/images) and ``metrique/plotting.py:52-329``
(Plotter over pandas series). Plotting proper is gated on matplotlib
(not installed in this container); the HTML report builder is dependency
-free and fully functional. Neither is part of the query engine — every
operator returns DataFrames, and only this boundary collects.
"""

from __future__ import annotations

import html
import os

try:  # pragma: no cover - matplotlib absent in this container
    import matplotlib.pyplot as plt  # noqa: F401

    HAS_MATPLOTLIB = True
except Exception:  # pragma: no cover
    HAS_MATPLOTLIB = False

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; margin: 2em auto; max-width: 60em; }}
nav a {{ display: block; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #999; padding: 0.3em 0.6em; }}
</style></head>
<body><nav>{sidebar}</nav>{body}</body></html>
"""


class Report:
    """Linear HTML report (reference ``Report``, ``reporting.py:30-109``):
    chapters land in a sidebar index; sections, text, tables, and figures
    append to the body. ``add_table`` is the Spark addition — it renders a
    (small!) DataFrame via ``toPandas``; cap rows explicitly."""

    def __init__(self, title: str, save_dir: str | None = None):
        self.title = title
        self.body = ""
        self.sidebar = ""
        self.fig_counter = 0
        self.chap_counter = 0
        self._base_dir = save_dir or os.getcwd()
        self._dir = os.path.join(self._base_dir, f"{title}_files")

    def add_chapter(self, title: str) -> None:
        chap_id = f"chap{self.chap_counter}"
        self.chap_counter += 1
        self.sidebar += (
            f'<a href="#{chap_id}">{html.escape(title)}</a>\n'
        )
        self.body += f'<h1 id="{chap_id}">{html.escape(title)}</h1>\n'

    def add_section(self, title: str) -> None:
        self.body += f"<h2>{html.escape(title)}</h2>\n"

    def add_text(self, text: str) -> None:
        self.body += f"<p>{html.escape(text)}</p>\n"

    def add_table(self, df, limit: int = 50) -> None:
        """Render a DataFrame (Spark or pandas) as an HTML table; Spark
        frames are limited BEFORE collection."""
        if hasattr(df, "toPandas"):
            df = df.limit(limit).toPandas()
        else:
            df = df.head(limit)
        self.body += df.to_html(index=False) + "\n"

    def add_image(self, figure, dpi: int = 72) -> None:
        """Save a matplotlib figure into ``{title}_files`` and embed it
        (reference ``add_image``, ``reporting.py:88-101``)."""
        if not HAS_MATPLOTLIB:
            raise RuntimeError("matplotlib required for add_image")
        os.makedirs(self._dir, exist_ok=True)
        name = os.path.join(self._dir, f"fig{self.fig_counter}.png")
        self.fig_counter += 1
        figure.savefig(name, dpi=dpi)
        self.body += f'<img src="{name}" />\n'

    def write_report(self, path: str | None = None) -> str:
        path = path or os.path.join(self._base_dir, f"{self.title}.html")
        with open(path, "w") as fh:
            fh.write(_TEMPLATE.format(
                title=html.escape(self.title),
                body=self.body,
                sidebar=self.sidebar,
            ))
        return path


def plot_history(history_df, label: str = "", **plot_kw):
    """Reference ``Plotter.plot`` analog for a history DataFrame
    (``_date``/count) — collects the tiny series and delegates to pandas
    plotting. Gated on matplotlib."""
    if not HAS_MATPLOTLIB:
        raise RuntimeError("matplotlib required for plotting")
    pdf = history_df.toPandas().set_index("_date")
    return pdf.plot(title=label, **plot_kw)
