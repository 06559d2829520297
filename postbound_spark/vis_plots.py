"""Statistical plots over the optimizer-loop result frames.

The reference ships a matplotlib convenience layer for exactly this data
(ref ``vis/plots.py`` — grid/facet helpers the examples use to draw
q-error distributions and runtime comparisons over ``execute_workload``
result frames). This module is its counterpart over the Spark repo's
experiment schemas (``experiments.run_optimizer_loop`` /
``experiments.distortion_sweep`` parquet columns), with two backends:

- **SVG (always available)**: self-contained renderers with no plotting
  dependency — q-error ECDF, q-error box plots, and runtime-comparison
  bars as ``bytes`` ready to write to ``.svg``. Build hosts for this
  repo have no matplotlib, and CI must exercise the real render path,
  not an import-skip.
- **matplotlib (import-gated)**: the same three figures through pyplot
  when the library is installed (``*_png`` variants), for notebook
  parity with the reference.

Design choices follow one validated scheme: a fixed categorical
assignment (never cycled), one hue per single-series figure, log scales
for q-errors (ratios), recessive axes, direct labels for ≤4 series plus
a legend, and text in ink colors rather than series colors.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pandas as pd

#: fixed categorical order (validated palette; assigned by sorted group
#: name, never re-assigned when groups are filtered)
PALETTE = [
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948",
]
_SURFACE = "#fcfcfb"
_INK = "#0b0b0b"
_INK_2 = "#52514e"
_GRID = "#e4e3df"
_FONT = 'font-family="Helvetica,Arial,sans-serif"'


def _esc(text) -> str:
    return (
        str(text).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


class _LogX:
    """Log-10 x scale with decade ticks."""

    def __init__(self, lo: float, hi: float, x0: float, x1: float):
        self.lo = max(lo, 1e-12)
        self.hi = max(hi, self.lo * 10)
        self.x0, self.x1 = x0, x1

    def __call__(self, v: float) -> float:
        v = max(v, self.lo)
        frac = (math.log10(v) - math.log10(self.lo)) / (
            math.log10(self.hi) - math.log10(self.lo)
        )
        return self.x0 + frac * (self.x1 - self.x0)

    def ticks(self, max_ticks: int = 8) -> list[float]:
        lo_e = math.floor(math.log10(self.lo))
        hi_e = math.ceil(math.log10(self.hi))
        # wide q-error ranges can span dozens of decades — step over whole
        # decades so at most ~max_ticks labeled gridlines render (75
        # colliding labels is worse than none)
        step = max(1, math.ceil((hi_e - lo_e) / max_ticks))
        return [10.0**e for e in range(lo_e, hi_e + 1, step)]


def _fmt(v: float) -> str:
    if v >= 10000 or (0 < v < 0.01):
        return f"1e{int(round(math.log10(v)))}" if v > 0 else "0"
    if v >= 1 and v == int(v):
        return str(int(v))
    return f"{v:.3g}"


def _svg(width: int, height: int, body: list[str]) -> bytes:
    head = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
        f'<rect width="{width}" height="{height}" fill="{_SURFACE}"/>'
    )
    return (head + "".join(body) + "</svg>").encode()


def _groups(df: pd.DataFrame, group_col: str | None) -> list[tuple[str, pd.DataFrame]]:
    if group_col is None or group_col not in df.columns:
        return [("", df)]
    # sorted → stable palette assignment independent of row order
    return [(str(k), g) for k, g in sorted(df.groupby(group_col))]


def qerror_ecdf_svg(
    df: pd.DataFrame,
    *,
    value_col: str = "max_qerror",
    group_col: str | None = "strategy",
    title: str = "q-error ECDF",
    width: int = 560,
    height: int = 360,
) -> bytes:
    """Empirical CDF of per-query q-errors, one line per group on a log
    x-axis — the distribution figure optimizer papers lead with."""
    ml, mr, mt, mb = 56, 96, 40, 44
    all_groups = _groups(df, group_col)
    # colors keyed by the UNFILTERED group list: a group whose values are
    # all NaN is dropped from the plot but must not shift the colors of
    # every later group between figures
    colors = {
        name: PALETTE[i % len(PALETTE)]
        for i, (name, _) in enumerate(all_groups)
    }
    groups = [
        (name, sorted(v for v in g[value_col].dropna() if v > 0))
        for name, g in all_groups
    ]
    groups = [(n, vs) for n, vs in groups if vs]
    if not groups:
        raise ValueError(f"no positive {value_col!r} values to plot")
    lo = min(vs[0] for _, vs in groups)
    hi = max(vs[-1] for _, vs in groups)
    sx = _LogX(min(lo, 1.0), hi, ml, width - mr)
    y0, y1 = height - mb, mt

    def sy(frac: float) -> float:
        return y0 + frac * (y1 - y0)

    body = [
        f'<text x="{ml}" y="22" {_FONT} font-size="14" fill="{_INK}" '
        f'font-weight="bold">{_esc(title)}</text>'
    ]
    for tick in sx.ticks():
        x = sx(tick)
        body.append(
            f'<line x1="{x:.1f}" y1="{y0}" x2="{x:.1f}" y2="{y1}" '
            f'stroke="{_GRID}" stroke-width="1"/>'
            f'<text x="{x:.1f}" y="{y0 + 16}" {_FONT} font-size="11" '
            f'fill="{_INK_2}" text-anchor="middle">{_fmt(tick)}</text>'
        )
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        y = sy(frac)
        body.append(
            f'<line x1="{ml}" y1="{y:.1f}" x2="{width - mr}" y2="{y:.1f}" '
            f'stroke="{_GRID}" stroke-width="1"/>'
            f'<text x="{ml - 6}" y="{y + 4:.1f}" {_FONT} font-size="11" '
            f'fill="{_INK_2}" text-anchor="end">{int(frac * 100)}%</text>'
        )
    for i, (name, values) in enumerate(groups):
        color = colors[name]
        n = len(values)
        pts = [f"{sx(values[0]):.1f},{sy(0.0):.1f}"]
        for j, v in enumerate(values):
            x = sx(v)
            pts.append(f"{x:.1f},{sy(j / n):.1f}")
            pts.append(f"{x:.1f},{sy((j + 1) / n):.1f}")
        body.append(
            f'<polyline points="{" ".join(pts)}" fill="none" '
            f'stroke="{color}" stroke-width="2"/>'
        )
        if name:  # direct label at the line's end + legend entry
            body.append(
                f'<text x="{width - mr + 8}" y="{mt + 16 + 18 * i}" {_FONT} '
                f'font-size="11" fill="{_INK}">'
                f'<tspan fill="{color}">&#9632;</tspan> {_esc(name)}</text>'
            )
    body.append(
        f'<text x="{(ml + width - mr) / 2:.0f}" y="{height - 8}" {_FONT} '
        f'font-size="11" fill="{_INK_2}" text-anchor="middle">'
        f"{_esc(value_col)} (log)</text>"
    )
    return _svg(width, height, body)


def _quartiles(values: Sequence[float]) -> tuple[float, float, float, float, float]:
    s = sorted(values)

    def q(p: float) -> float:
        idx = p * (len(s) - 1)
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        return s[lo] + (s[hi] - s[lo]) * (idx - lo)

    return s[0], q(0.25), q(0.5), q(0.75), s[-1]


def qerror_box_svg(
    df: pd.DataFrame,
    *,
    value_col: str = "max_qerror",
    group_col: str = "strategy",
    title: str = "q-error by strategy",
    width: int = 560,
    height: int = 300,
) -> bytes:
    """Min/quartile/median/max box per group, log x — the compact
    strategy-comparison figure."""
    ml, mr, mt, mb = 110, 24, 40, 44
    all_groups = _groups(df, group_col)
    colors = {  # unfiltered assignment — see qerror_ecdf_svg
        name: PALETTE[i % len(PALETTE)]
        for i, (name, _) in enumerate(all_groups)
    }
    groups = [
        (name, [v for v in g[value_col].dropna() if v > 0])
        for name, g in all_groups
    ]
    groups = [(n, vs) for n, vs in groups if vs]
    if not groups:
        raise ValueError(f"no positive {value_col!r} values to plot")
    lo = min(min(vs) for _, vs in groups)
    hi = max(max(vs) for _, vs in groups)
    sx = _LogX(min(lo, 1.0), hi, ml, width - mr)
    row_h = (height - mt - mb) / len(groups)

    body = [
        f'<text x="{ml}" y="22" {_FONT} font-size="14" fill="{_INK}" '
        f'font-weight="bold">{_esc(title)}</text>'
    ]
    for tick in sx.ticks():
        x = sx(tick)
        body.append(
            f'<line x1="{x:.1f}" y1="{mt}" x2="{x:.1f}" y2="{height - mb}" '
            f'stroke="{_GRID}" stroke-width="1"/>'
            f'<text x="{x:.1f}" y="{height - mb + 16}" {_FONT} font-size="11" '
            f'fill="{_INK_2}" text-anchor="middle">{_fmt(tick)}</text>'
        )
    for i, (name, values) in enumerate(groups):
        color = colors[name]
        cy = mt + (i + 0.5) * row_h
        v_min, q1, med, q3, v_max = _quartiles(values)
        half = min(row_h * 0.28, 14)
        body.append(
            f'<line x1="{sx(v_min):.1f}" y1="{cy:.1f}" x2="{sx(v_max):.1f}" '
            f'y2="{cy:.1f}" stroke="{color}" stroke-width="2"/>'
            f'<rect x="{sx(q1):.1f}" y="{cy - half:.1f}" '
            f'width="{max(sx(q3) - sx(q1), 1):.1f}" height="{2 * half:.1f}" '
            f'rx="2" fill="{color}" fill-opacity="0.35" stroke="{color}" '
            f'stroke-width="1"/>'
            f'<line x1="{sx(med):.1f}" y1="{cy - half:.1f}" x2="{sx(med):.1f}" '
            f'y2="{cy + half:.1f}" stroke="{color}" stroke-width="2"/>'
            f'<text x="{ml - 8}" y="{cy + 4:.1f}" {_FONT} font-size="11" '
            f'fill="{_INK}" text-anchor="end">{_esc(name or value_col)}</text>'
        )
    return _svg(width, height, body)


def runtime_bars_svg(
    df: pd.DataFrame,
    *,
    time_col: str = "exec_time",
    label_col: str = "label",
    group_col: str | None = "strategy",
    title: str = "runtime comparison",
    width: int = 640,
    max_rows: int = 30,
) -> bytes:
    """Horizontal grouped bars of mean runtime per (label, group) — the
    reference's runtime-comparison figure over workload results. Labels
    beyond ``max_rows`` are dropped with a note (no silent truncation)."""
    groups = _groups(df, group_col)
    names = [n for n, _ in groups]
    labels = list(dict.fromkeys(df[label_col]))
    dropped = max(0, len(labels) - max_rows)
    labels = labels[:max_rows]
    means = {
        (str(n), lbl): float(g[g[label_col] == lbl][time_col].mean())
        for n, g in groups
        for lbl in labels
    }
    hi = max((v for v in means.values() if not math.isnan(v)), default=1.0)
    ml, mr, mt, mb = 150, 70, 40, 30
    bar_h, gap = 12, 2
    band = len(names) * (bar_h + gap) + 8
    height = mt + band * len(labels) + mb
    x0, x1 = ml, width - mr

    def sx(v: float) -> float:
        return x0 + (0 if hi == 0 else v / hi) * (x1 - x0)

    body = [
        f'<text x="{ml}" y="22" {_FONT} font-size="14" fill="{_INK}" '
        f'font-weight="bold">{_esc(title)}</text>'
    ]
    for j, lbl in enumerate(labels):
        top = mt + j * band
        body.append(
            f'<text x="{ml - 8}" y="{top + band / 2 + 2:.1f}" {_FONT} '
            f'font-size="11" fill="{_INK}" text-anchor="end">{_esc(lbl)}</text>'
        )
        for i, name in enumerate(names):
            v = means[(str(name), lbl)]
            if math.isnan(v):
                continue
            color = PALETTE[i % len(PALETTE)]
            y = top + 4 + i * (bar_h + gap)
            w = max(sx(v) - x0, 1)
            body.append(
                f'<rect x="{x0}" y="{y:.1f}" width="{w:.1f}" '
                f'height="{bar_h}" rx="2" fill="{color}"/>'
                f'<text x="{x0 + w + 6:.1f}" y="{y + bar_h - 2:.1f}" {_FONT} '
                f'font-size="10" fill="{_INK_2}">{v:.3g}s</text>'
            )
    for i, name in enumerate(names):
        if name:
            body.append(
                f'<text x="{x0 + 150 * i}" y="{mt - 8}" {_FONT} font-size="11" '
                f'fill="{_INK}"><tspan fill="{PALETTE[i % len(PALETTE)]}">'
                f"&#9632;</tspan> {_esc(name)}</text>"
            )
    if dropped:
        body.append(
            f'<text x="{ml}" y="{height - 10}" {_FONT} font-size="10" '
            f'fill="{_INK_2}">… {dropped} more labels not shown</text>'
        )
    return _svg(width, height, body)


# -- matplotlib backend (import-gated; notebook parity with the reference) --


def _require_matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as exc:
        raise ImportError(
            "the *_png renderers need matplotlib (not installed on this "
            "host); use the dependency-free *_svg renderers instead"
        ) from exc


def _fig_png(fig) -> bytes:
    import io

    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=120, bbox_inches="tight")
    return buf.getvalue()


def qerror_ecdf_png(df: pd.DataFrame, *, value_col: str = "max_qerror",
                    group_col: str | None = "strategy") -> bytes:
    plt = _require_matplotlib()
    fig, ax = plt.subplots(figsize=(5.6, 3.6))
    for i, (name, g) in enumerate(_groups(df, group_col)):
        values = sorted(v for v in g[value_col].dropna() if v > 0)
        if not values:
            continue
        frac = [j / len(values) for j in range(1, len(values) + 1)]
        ax.step(values, frac, where="post", label=name or value_col,
                color=PALETTE[i % len(PALETTE)])
    ax.set_xscale("log")
    ax.set_xlabel(value_col)
    ax.set_ylabel("fraction of queries")
    if group_col:
        ax.legend()
    out = _fig_png(fig)
    plt.close(fig)
    return out


def runtime_bars_png(df: pd.DataFrame, *, time_col: str = "exec_time",
                     label_col: str = "label",
                     group_col: str | None = "strategy") -> bytes:
    plt = _require_matplotlib()
    pivot = df.pivot_table(index=label_col, columns=group_col or (),
                           values=time_col, aggfunc="mean")
    fig, ax = plt.subplots(figsize=(6.4, 0.3 * len(pivot) + 1))
    pivot.plot.barh(ax=ax, color=PALETTE[: max(pivot.shape[1], 1)])
    ax.set_xlabel(f"{time_col} (s)")
    out = _fig_png(fig)
    plt.close(fig)
    return out
