"""Minimal dependency-free SVG charting.

The reference renders with plotly + matplotlib (app.py:3-4) — neither is a
TPU-image dependency, so the framework carries a small SVG backend
sufficient for its four analysis views: overlaid line plots (linear/log x),
dashed vertical markers, and stem plots.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

_W, _H = 900, 320
_ML, _MR, _MT, _MB = 60, 20, 30, 45
_BG = "#111111"
_FG = "#00ff00"
_GRID = "#333333"
_TEXT = "#9adf9a"


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


class Figure:
    """One SVG chart; add traces then render()."""

    def __init__(
        self,
        title: str,
        xlabel: str = "",
        ylabel: str = "",
        logx: bool = False,
        width: int = _W,
        height: int = _H,
    ):
        self.title, self.xlabel, self.ylabel = title, xlabel, ylabel
        self.logx = logx
        self.w, self.h = width, height
        self.traces: List[dict] = []
        self.vlines: List[Tuple[float, str]] = []

    def line(self, x, y, color: str, label: str = "", width: float = 1.2,
             opacity: float = 1.0, dash: Optional[str] = None):
        self.traces.append(dict(kind="line", x=np.asarray(x, float),
                                y=np.asarray(y, float), color=color,
                                label=label, lw=width, op=opacity, dash=dash))
        return self

    def stem(self, x, y, color: str, label: str = ""):
        self.traces.append(dict(kind="stem", x=np.asarray(x, float),
                                y=np.asarray(y, float), color=color,
                                label=label, lw=1.0, op=1.0, dash=None))
        return self

    def vline(self, x: float, color: str = "#ff5500"):
        self.vlines.append((float(x), color))
        return self

    # -- scaling ---------------------------------------------------------
    def _ranges(self):
        xs, ys = [], []
        for t in self.traces:
            x, y = t["x"], t["y"]
            m = np.isfinite(x) & np.isfinite(y)
            if self.logx:
                m &= x > 0
            if m.any():
                xs.append((x[m].min(), x[m].max()))
                ys.append((y[m].min(), y[m].max()))
        if not xs:
            return (0.0, 1.0), (0.0, 1.0)
        x0 = min(a for a, _ in xs); x1 = max(b for _, b in xs)
        y0 = min(a for a, _ in ys); y1 = max(b for _, b in ys)
        if x1 <= x0:
            x1 = x0 + 1
        if y1 <= y0:
            y1 = y0 + 1
        pad = 0.05 * (y1 - y0)
        return (x0, x1), (y0 - pad, y1 + pad)

    def _px(self, xr):
        x0, x1 = xr
        iw = self.w - _ML - _MR
        if self.logx:
            l0, l1 = math.log10(x0), math.log10(x1)

            def f(v):
                v = np.maximum(v, x0)
                return _ML + (np.log10(v) - l0) / (l1 - l0) * iw
        else:
            def f(v):
                return _ML + (v - x0) / (x1 - x0) * iw
        return f

    def _py(self, yr):
        y0, y1 = yr
        ih = self.h - _MT - _MB

        def f(v):
            return _MT + (y1 - v) / (y1 - y0) * ih
        return f

    def _xticks(self, xr):
        x0, x1 = xr
        if self.logx:
            lo, hi = math.ceil(math.log10(x0)), math.floor(math.log10(x1))
            return [10.0 ** e for e in range(lo, hi + 1)]
        return list(np.linspace(x0, x1, 6))

    @staticmethod
    def _fmt(v: float) -> str:
        if v == 0:
            return "0"
        if abs(v) >= 1000:
            return f"{v/1000:.3g}k"
        return f"{v:.3g}"

    def render(self) -> str:
        xr, yr = self._ranges()
        px, py = self._px(xr), self._py(yr)
        parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{self.w}" '
            f'height="{self.h}" style="background:{_BG};font-family:monospace">'
        ]
        # grid + ticks
        for xt in self._xticks(xr):
            if xt < xr[0] or xt > xr[1]:
                continue
            X = px(xt)
            parts.append(f'<line x1="{X:.1f}" y1="{_MT}" x2="{X:.1f}" '
                         f'y2="{self.h-_MB}" stroke="{_GRID}" stroke-width="0.5"/>')
            parts.append(f'<text x="{X:.1f}" y="{self.h-_MB+16}" fill="{_TEXT}" '
                         f'font-size="10" text-anchor="middle">{self._fmt(xt)}</text>')
        for yt in np.linspace(yr[0], yr[1], 5):
            Y = py(yt)
            parts.append(f'<line x1="{_ML}" y1="{Y:.1f}" x2="{self.w-_MR}" '
                         f'y2="{Y:.1f}" stroke="{_GRID}" stroke-width="0.5"/>')
            parts.append(f'<text x="{_ML-6}" y="{Y+3:.1f}" fill="{_TEXT}" '
                         f'font-size="10" text-anchor="end">{self._fmt(yt)}</text>')
        # vlines
        for xv, color in self.vlines:
            if xr[0] <= xv <= xr[1]:
                X = px(xv)
                parts.append(
                    f'<line x1="{X:.1f}" y1="{_MT}" x2="{X:.1f}" '
                    f'y2="{self.h-_MB}" stroke="{color}" stroke-width="1" '
                    f'stroke-dasharray="5,4" opacity="0.7"/>'
                )
        # traces
        y_base = py(max(yr[0], min(0.0, yr[1])))
        for t in self.traces:
            X, Y = px(t["x"]), py(t["y"])
            if t["kind"] == "stem":
                for xi, yi in zip(X, Y):
                    parts.append(
                        f'<line x1="{xi:.1f}" y1="{y_base:.1f}" x2="{xi:.1f}" '
                        f'y2="{yi:.1f}" stroke="{t["color"]}" stroke-width="1"/>'
                    )
                    parts.append(
                        f'<circle cx="{xi:.1f}" cy="{yi:.1f}" r="2.4" '
                        f'fill="{t["color"]}"/>'
                    )
            else:
                pts = " ".join(f"{a:.1f},{b:.1f}" for a, b in zip(X, Y))
                dash = f' stroke-dasharray="{t["dash"]}"' if t["dash"] else ""
                parts.append(
                    f'<polyline points="{pts}" fill="none" '
                    f'stroke="{t["color"]}" stroke-width="{t["lw"]}" '
                    f'opacity="{t["op"]}"{dash}/>'
                )
        # title/labels/legend
        parts.append(f'<text x="{_ML}" y="18" fill="{_FG}" font-size="13">'
                     f'{_esc(self.title)}</text>')
        if self.xlabel:
            parts.append(f'<text x="{(self.w)//2}" y="{self.h-8}" fill="{_TEXT}" '
                         f'font-size="11" text-anchor="middle">{_esc(self.xlabel)}</text>')
        if self.ylabel:
            parts.append(
                f'<text x="14" y="{self.h//2}" fill="{_TEXT}" font-size="11" '
                f'text-anchor="middle" transform="rotate(-90 14 {self.h//2})">'
                f'{_esc(self.ylabel)}</text>')
        lx = self.w - _MR - 10
        for i, t in enumerate(self.traces):
            if t["label"]:
                parts.append(
                    f'<text x="{lx}" y="{_MT + 14 + 14*i}" fill="{t["color"]}" '
                    f'font-size="11" text-anchor="end">{_esc(t["label"])}</text>')
        parts.append("</svg>")
        return "".join(parts)


def decimate_for_display(data: np.ndarray, max_points: int = 2500) -> np.ndarray:
    """Stride decimation for plotting (reference: app.py:102-106)."""
    data = np.asarray(data)
    if len(data) > max_points:
        step = int(np.ceil(len(data) / max_points))
        return data[::step]
    return data
