"""docs/USAGE.md smoke (r12 verdict ask #7, test_cli.py style): every
fenced python block in the usage page EXECUTES against sf0.001 with
spark/sf_dir/tmp_dir pre-bound. The blocks carry their own asserts, so
a rotted example (renamed function, changed schema, wrong column) fails
here instead of in a user's session."""

from __future__ import annotations

import pathlib
import re

import pytest

_USAGE = pathlib.Path(__file__).resolve().parents[1] / "docs" / "USAGE.md"


def _blocks():
    text = _USAGE.read_text()
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    assert len(blocks) >= 6, "usage page lost its six canonical flows"
    return blocks


@pytest.mark.parametrize("idx", range(len(_blocks())))
def test_usage_block_executes(idx, spark, sf_dir, tmp_path):
    block = _blocks()[idx]
    ns = {"spark": spark, "sf_dir": sf_dir, "tmp_dir": str(tmp_path)}
    exec(compile(block, f"USAGE.md[block {idx}]", "exec"), ns)  # noqa: S102
