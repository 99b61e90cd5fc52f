"""Opt-in smoke run of the shipped examples (they are real user surface;
a broken example is a release defect).  Gated behind
ALPINE_RUN_EXAMPLE_TESTS=1 because each example is a full small workflow
(~30-90 s on CPU) — run them before cutting a round artifact:

    ALPINE_RUN_EXAMPLE_TESTS=1 python -m pytest tests/test_examples.py -q

The examples pick the default jax backend; the conftest already pins CPU
with 8 virtual devices, which is exactly the documented CPU invocation of
atlas_sharded.py.  multiprocess_dcn.py self-launches its worker processes
and is exercised separately (it re-execs python; see examples/ and
tests/test_multiprocess.py for the in-suite 2-process proof).
"""

import os
import runpy
import sys

import pytest

pytestmark = pytest.mark.slow  # see pyproject: excluded from the default gate

RUN = os.environ.get("ALPINE_RUN_EXAMPLE_TESTS", "") not in ("", "0", "false")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = ["quickstart", "sparse_counts_int8", "hyperparameter_search",
            "atlas_sharded", "fast_sampling"]


@pytest.mark.skipif(not RUN, reason="set ALPINE_RUN_EXAMPLE_TESTS=1")
@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, monkeypatch, capsys):
    monkeypatch.setenv("ALPINE_EXAMPLE_CPU", "1")  # atlas_sharded honors it
    monkeypatch.chdir(ROOT)
    sys.modules.pop("__mp_main__", None)
    runpy.run_path(os.path.join(ROOT, "examples", f"{name}.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"example {name} produced no output"
