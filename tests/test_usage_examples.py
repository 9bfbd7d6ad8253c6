"""docs/USAGE.md is executable documentation: every fenced python
block is extracted from the markdown AND RUN here, so the public-API
examples cannot drift from the code. Each block is self-contained
(own imports, own get_spark call — getOrCreate reuses the test
session's JVM) and carries its own assertions.
"""

import os
import re
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
USAGE = REPO / "docs" / "USAGE.md"


def _blocks():
    text = USAGE.read_text()
    found = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    assert len(found) >= 4, "USAGE.md must keep all four examples"
    return found


@pytest.mark.parametrize("idx", range(len(_blocks())))
def test_usage_example_runs(idx, spark, tmp_path, monkeypatch):
    monkeypatch.setenv("ENGINE_REPO", str(REPO))
    monkeypatch.setenv("USAGE_TMP", str(tmp_path))
    monkeypatch.setenv("SF_DIR", os.environ.get("SF_DIR", "/root/testdata/sf0.001"))
    code = _blocks()[idx]
    exec(compile(code, f"USAGE.md:block{idx}", "exec"), {"__name__": f"usage{idx}"})
