"""Multi-process distribution via jax.distributed (SURVEY.md §4 recipe:
N processes x D virtual CPU devices; the real-slice mechanism is the
same mesh/sharding code with TPU devices).

Spawned as subprocesses because jax.distributed must initialize before
any backend — the in-process test session already owns a backend.
"""

import json
import os
import subprocess
import sys


def test_two_process_sharded_witness_and_checker(tmp_path):
    """2 coordinated processes form one 8-device mesh, shard the
    witness batch, verify per-element host parity on each process's
    local shards, and run the checker's all-ok reduction as a REAL
    cross-process collective (VERDICT r2 item 3)."""
    out = tmp_path / "mp.json"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, "-m", "circom_tpu.parallel.multihost",
         "--spawn", "2", "--out", str(out)],
        env=env, timeout=540, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    art = json.loads(out.read_text())
    assert art["ok"] and art["checker_all_ok"]
    assert art["n_processes"] == 2 and art["global_devices"] == 8
    assert art["parity"] == "exact"
    assert art["elements_checked_per_process"] * 2 == art["batch"]
