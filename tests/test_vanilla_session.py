"""Vanilla-session environment-contract regression (VERDICT r5 #4).

The driver hands the engine a vanilla ``SparkSession`` — none of
``session.py``'s tuned confs exist there. Three r5 driver reds were
invisible locally because every local gate ran on the tuned factory
session. This test spawns a SUBPROCESS that builds a bare
``SparkSession.builder.getOrCreate()`` and pushes the four sentinel
queries through the driver-faithful gate (vanilla confs + raw
``sort_values`` canonicalization + exact value compare):

- ``x_program_recursive`` — localCheckpoint + self-union, the Spark
  4.1 constraint-propagation blast zone (needs the runtime conf pin
  in ``_ensure_session_confs``);
- ``x_cdc_journal_roundtrip`` — Python DataSource ``pushFilters``
  hard-errors unless ``python.filterPushdown`` is pinned;
- ``x_agg_boolean_set`` — array output columns are unhashable by the
  driver's canonicalizer;
- ``zset_incremental_view`` — Z-set D/I pipeline, second
  checkpoint-union shape.

A subprocess is required: the in-process test session is the tuned
factory one, and Spark allows only one session per JVM.
"""

from __future__ import annotations

import pytest

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SENTINELS = (
    "x_program_recursive",
    "x_cdc_journal_roundtrip",
    "x_agg_boolean_set",
    "zset_incremental_view",
)


@pytest.mark.slow
def test_sentinels_pass_on_vanilla_session():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the engine must export it itself
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "vanilla_sweep.py"),
            "--names",
            ",".join(SENTINELS),
            "--cpus",
            "8",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"vanilla-session sweep failed:\n{proc.stdout[-4000:]}\n"
        f"{proc.stderr[-4000:]}"
    )
    assert '"failed": []' in proc.stdout
