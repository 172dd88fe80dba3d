"""Child process of ``tests/test_multihost.py`` — one of two
``jax.distributed`` processes on localhost (CPU backend).

Covers the last untested seam of ``train_gmpi.py --multihost``
(vs the reference's gloo process group, ``gmpi/train_helpers.py:111-117``):

1. ShardedLoader shards are disjoint and complete across processes;
2. a data-sharded gradient (XLA-inserted cross-process psum) equals the
   single-process full-batch gradient;
3. rank-0-only checkpoint write: process 0 writes, both processes restore
   the same values (the ``train/loop.py`` guard pattern).

Writes a JSON result file per process for the parent to assert on.
"""

import json
import os
import sys


def main() -> None:
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    import numpy as np

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    result = {"pid": pid}

    # -- 1. loader sharding (DistributedSampler semantics) ------------------
    from gmpi_tpu.data.loader import ShardedLoader

    class Toy:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            return (np.float32([i]),)

    loader = ShardedLoader(Toy(), batch_size=2, shard_id=pid, num_shards=2,
                           seed=3, num_workers=0)
    result["shard_indices"] = [int(i) for i in loader._epoch_indices(0)]

    # -- 2. cross-process gradient psum --------------------------------------
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    x = np.arange(8, dtype=np.float32) + 1.0  # the global batch

    def loss(w, xb):
        return jnp.mean((w * xb - 1.0) ** 2)

    w0 = jnp.float32(0.5)
    # single-process oracle: every process can compute it locally
    expected = float(jax.grad(loss)(w0, jnp.asarray(x)))
    local = x[pid * 4:(pid + 1) * 4]
    gx = jax.make_array_from_process_local_data(sh, local, global_shape=(8,))
    g = jax.jit(jax.grad(loss), in_shardings=(None, sh))(w0, gx)
    result["grad"] = float(g)
    result["grad_expected"] = expected

    # -- 3. collective checkpoint write through save_checkpoint --------------
    # All processes enter save_checkpoint (orbax syncs internally; the
    # primary host commits + writes the `latest` pointer) and both restore
    # identical values — the exact pattern train/loop.py runs in multihost.
    from gmpi_tpu.train.step import TrainState
    from gmpi_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    zeros = lambda: {"w": np.zeros((4,), np.float32)}
    vals = lambda: {"w": np.full((4,), 2.5, np.float32)}
    mk = lambda leaf, step: TrainState(
        params_g=leaf(), buffers_g=leaf(), params_d=leaf(),
        ema=leaf(), ema2=leaf(), opt_g=leaf(), opt_d=leaf(),
        step=np.int64(step))
    ckpt_dir = os.path.join(out_dir, "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint(ckpt_dir, mk(vals, 7))
    multihost_utils.sync_global_devices("ckpt_written")
    restored = load_checkpoint(ckpt_dir, mk(zeros, 0))
    result["ckpt_ok"] = bool(
        np.allclose(restored.params_g["w"], 2.5) and int(restored.step) == 7
        and os.path.exists(os.path.join(ckpt_dir, "latest"))
    )

    with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
