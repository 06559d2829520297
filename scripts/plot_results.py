#!/usr/bin/env python
"""Render the standard figures for an experiment result parquet.

Works on both loop schemas (``experiments.run_optimizer_loop`` and
``experiments.distortion_sweep``) and writes dependency-free SVGs next
to the input (the matplotlib ``*_png`` backend is available from
``postbound_spark.vis_plots`` when the library is installed).

Usage:
    python scripts/plot_results.py experiments/results/job_distortion_sweep.parquet
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    import pandas as pd

    from postbound_spark.vis_plots import (
        qerror_box_svg,
        qerror_ecdf_svg,
        runtime_bars_svg,
    )

    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    path = sys.argv[1]
    df = pd.read_parquet(path)
    stem = path.removesuffix(".parquet")
    group = "strategy" if "strategy" in df.columns else "distortion_factor"

    outputs = {
        f"{stem}_qerror_ecdf.svg": qerror_ecdf_svg(
            df, group_col=group, title=f"q-error ECDF by {group}"
        ),
        f"{stem}_qerror_box.svg": qerror_box_svg(
            df, group_col=group, title=f"q-error by {group}"
        ),
        f"{stem}_runtime_bars.svg": runtime_bars_svg(
            df, group_col=group, title=f"runtime by {group}"
        ),
    }
    for out_path, payload in outputs.items():
        with open(out_path, "wb") as fh:
            fh.write(payload)
        print(f"{out_path} ({len(payload)} bytes)")


if __name__ == "__main__":
    main()
