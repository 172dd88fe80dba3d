"""Two-process ``jax.distributed`` test on localhost (CPU backend).

The reference's distribution layer is a single-node gloo process group
(``gmpi/train_helpers.py:111-117``) with DistributedSampler data sharding and
DDP gradient allreduce.  Our equivalents — ``ShardedLoader``, XLA-inserted
psum over the mesh's data axis, and rank-0-only orbax checkpointing — are
exercised here across a REAL process boundary, the configuration
``train_gmpi.py --multihost`` runs in (scaled down to 2 localhost processes).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # children use 1 local device each
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(port), str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child rc={p.returncode}\n{out[-4000:]}"

    results = []
    for pid in (0, 1):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))

    # 1. disjoint + complete shards (DistributedSampler pad semantics:
    #    13 samples -> 7 per shard, padded with wrapped-around indices)
    s0, s1 = (set(r["shard_indices"]) for r in results)
    assert len(results[0]["shard_indices"]) == 7
    assert len(results[1]["shard_indices"]) == 7
    assert (
        set(results[0]["shard_indices"]) | set(results[1]["shard_indices"])
    ) == set(range(13))
    # the only duplicate across shards is the single pad sample
    all_idx = results[0]["shard_indices"] + results[1]["shard_indices"]
    assert len(all_idx) - len(set(all_idx)) == 1

    # 2. cross-process gradient == single-process full-batch gradient
    for r in results:
        np.testing.assert_allclose(r["grad"], r["grad_expected"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["grad"], results[1]["grad"], rtol=0)

    # 3. rank-0 write, both-rank restore
    assert results[0]["ckpt_ok"] and results[1]["ckpt_ok"]
