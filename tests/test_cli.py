"""CLI smoke tests — the reference's subprocess --help checks
(scripts/tests/test_sarif_converter.py:443-455 etc.), plus parser wiring."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO}


@pytest.mark.parametrize(
    "args", [["--help"], ["convert", "--help"], ["ingest", "--help"],
             ["stage", "--help"], ["monitor", "--help"], ["compact", "--help"]]
)
def test_cli_help_exits_zero(args):
    res = subprocess.run(
        [sys.executable, "-m", "boann_ocsf_security_data_platform_spark.cli", *args],
        capture_output=True,
        text=True,
        env=ENV,
        timeout=60,
    )
    assert res.returncode == 0
    assert "usage" in (res.stdout + res.stderr).lower()


def test_cli_missing_subcommand_errors():
    res = subprocess.run(
        [sys.executable, "-m", "boann_ocsf_security_data_platform_spark.cli"],
        capture_output=True,
        text=True,
        env=ENV,
        timeout=60,
    )
    assert res.returncode != 0


def test_parser_wires_all_subcommands():
    from boann_ocsf_security_data_platform_spark.cli import build_parser

    p = build_parser()
    subs = next(
        a for a in p._actions if isinstance(a, type(p._subparsers._group_actions[0]))
    )
    assert set(subs.choices) == {"convert", "ingest", "stage", "monitor", "compact"}
