"""Full-registry oracle gate (ADVICE r05 item 1).

The external driver's correctness gate snapshots the first 50 ``queries()``
entries; the registry holds 54, so the last four (seg_agg_list_set,
seg_extend_shift_round, pts_point_to_linear, seg_resegment_balance) are
outside the driver's window and would regress silently. This test wires
``tools/check_oracle.py`` over the FULL registry into the suite so every
declared query stays continuously verified against DuckDB.

It is env-gated (``SPARK_GRAFT_ORACLE_FULL=1``) because the full pass
costs ~10 minutes — roughly doubling the suite — and the four evicted
queries alone are cheap, so the DEFAULT run covers exactly the gap the
driver leaves and the env flag upgrades to the complete registry.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EVICTED = [
    "seg_agg_list_set",
    "seg_extend_shift_round",
    "pts_point_to_linear",
    "seg_resegment_balance",
]


def _run_oracle(names: list[str]) -> None:
    env = dict(os.environ, SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"), *names],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_driver_evicted_queries_stay_oracle_green():
    """The four registry entries beyond the driver's 50-query window."""
    _run_oracle(EVICTED)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_ORACLE_FULL") != "1",
    reason="full 54-query oracle pass (~10 min); set SPARK_GRAFT_ORACLE_FULL=1",
)
def test_full_registry_oracle_green():
    _run_oracle([])
