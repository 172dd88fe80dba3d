"""Model/runtime introspection — analogues of the reference's ``misc``
toolbox (``gmpi/models/torch_utils/misc.py``):

* :func:`assert_shape` — ``misc.assert_shape`` (``misc.py:83-96``);
* :func:`param_summary` / :func:`print_param_summary` — startup module table
  (``misc.print_module_summary``, ``misc.py:196-264``);
* :func:`check_replica_consistency` — ``misc.check_ddp_consistency``
  (``misc.py:182-191``): verify that nominally-replicated params hold
  identical values on every device of a mesh;
* :func:`profile_scope` — named profiler scopes (``misc.profiled_function``
  -> ``jax.named_scope`` + ``jax.profiler`` trace annotations).
"""

from __future__ import annotations

import contextlib
from typing import Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def assert_shape(x, shape: Sequence[Optional[int]]) -> None:
    """Shape assert with None wildcards (``misc.assert_shape``)."""
    assert x.ndim == len(shape), f"rank {x.ndim} != {len(shape)}"
    for i, (got, want) in enumerate(zip(x.shape, shape)):
        if want is not None:
            assert got == want, f"dim {i}: {got} != {want} (shape {tuple(x.shape)})"


def param_summary(tree, prefix: str = "") -> Tuple[list, int]:
    """Flatten a param tree into (path, shape, count) rows + total."""
    rows = []
    total = 0

    def walk(node, path):
        nonlocal total
        if isinstance(node, dict):
            for k in sorted(node):
                walk(node[k], path + (k,))
        else:
            n = int(np.prod(node.shape)) if node.shape else 1
            rows.append((".".join(path), tuple(node.shape), n))
            total += n

    walk(tree, (prefix,) if prefix else ())
    return rows, total


def print_param_summary(tree, prefix: str = "", max_rows: int = 0) -> int:
    rows, total = param_summary(tree, prefix)
    shown = rows if max_rows <= 0 else rows[:max_rows]
    width = max((len(r[0]) for r in shown), default=10)
    for name, shape, n in shown:
        print(f"{name:<{width}}  {str(shape):<20} {n:>12,}")
    if max_rows > 0 and len(rows) > max_rows:
        print(f"... {len(rows) - max_rows} more entries")
    print(f"{'TOTAL':<{width}}  {'':<20} {total:>12,}")
    return total


def check_replica_consistency(tree, atol: float = 0.0) -> None:
    """Assert that every array in ``tree`` holds identical values on all of
    its addressable shards — the SPMD analogue of DDP's broadcast-and-compare
    (``misc.check_ddp_consistency``).  Raises on divergence."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        sharding = getattr(leaf, "sharding", None)
        if sharding is None or not sharding.is_fully_replicated:
            continue  # intentionally sharded leaves hold different slices
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            got = np.asarray(s.data)
            if not np.allclose(ref, got, atol=atol, rtol=0):
                name = jax.tree_util.keystr(path)
                raise AssertionError(
                    f"replica divergence at {name}: max abs diff "
                    f"{np.abs(ref - got).max()} between devices "
                    f"{shards[0].device} and {s.device}"
                )


@contextlib.contextmanager
def profile_scope(name: str):
    """Named scope visible in jax.profiler traces (``profiled_function``)."""
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield


def trace(log_dir: str):
    """Context manager starting/stopping a jax profiler trace."""
    return jax.profiler.trace(log_dir)
