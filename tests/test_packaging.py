"""Packaging metadata stays valid and in sync with the package tree."""

from __future__ import annotations

import os
import tomllib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_parses_and_names_the_package():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as fh:
        meta = tomllib.load(fh)
    project = meta["project"]
    assert project["name"] == "postbound-spark"
    assert any(d.startswith("pyspark") for d in project["dependencies"])
    # every optional extra must be importable-or-absent by design: the
    # code import-gates each of these, so they belong in extras, never
    # in hard dependencies
    extras = meta["project"]["optional-dependencies"]
    assert set(extras) == {"test", "vis", "multimodal"}
    include = meta["tool"]["setuptools"]["packages"]["find"]["include"]
    assert include == ["postbound_spark*"]


def test_version_matches_round():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as fh:
        meta = tomllib.load(fh)
    major, minor, _patch = meta["project"]["version"].split(".")
    assert (major, minor) >= ("0", "6")
