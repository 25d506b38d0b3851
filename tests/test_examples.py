"""Examples must stay runnable (they are the user-facing quickstart)."""

import runpy
import sys

import pytest


@pytest.mark.parametrize("script", [
    "examples/quickstart.py",
    "examples/risk_workflow.py",
    "examples/heston_workflow.py",
    "examples/xva_workflow.py",
    "examples/exotics_workflow.py",
    "examples/slv_workflow.py",
    "examples/rbergomi_workflow.py",
])
@pytest.mark.slow
def test_example_runs(script, capsys):
    runpy.run_path(script, run_name="__main__")
    out = capsys.readouterr().out
    assert "Traceback" not in out


@pytest.mark.slow
def test_surface_workflow_runs(capsys):
    runpy.run_path("examples/surface_workflow.py", run_name="__main__")
