"""The reference's own golden corpus, replayed end-to-end.

`tools/ref_parity.py` parses every TestHandleQuery entry out of
`/root/reference/src/server/query_handler_test.go` at RUNTIME (~273 query →
{columns, wire-text values} goldens — nothing copied into this repo) and
replays each through PgSession against the reproduced 41-column fixture.
Success = every entry matches exactly, or is one of the ~20 documented
deviations in tools/ref_parity_deviations.py (each pg-faithful or more
precise than the reference's behavior).

Runs in a subprocess: the corpus expects the reference test config's user
("user"), which must be set before bemidb modules load.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_TEST = "/root/reference/src/server/query_handler_test.go"


@pytest.mark.skipif(not os.path.exists(REF_TEST), reason="reference checkout absent")
def test_reference_golden_corpus_passes():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ref_parity.py")],
        cwd=REPO,
        env={**os.environ, "BEMIDB_SPARK_USER": "user"},
        capture_output=True,
        text=True,
        timeout=900,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"reference-corpus FAILs:\n{tail}"
    assert " 0 FAIL " in proc.stdout.splitlines()[-1]
