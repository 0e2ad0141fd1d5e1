"""CLI surface tests (python -m gan_deeplearning4j_spark)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from gan_deeplearning4j_spark.__main__ import main


def test_cli_list_enumerates_registry():
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["--list"])
    assert rc == 0
    out = buf.getvalue()
    from gan_deeplearning4j_spark.queries import REGISTRY
    # one line per query, each naming its check kind
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == len(REGISTRY)
    assert all(("[oracled]" in ln) or ("[rows-only]" in ln) for ln in lines)


def test_cli_unknown_query_is_an_error():
    rc = main(["definitely_not_a_query"])
    assert rc == 2
