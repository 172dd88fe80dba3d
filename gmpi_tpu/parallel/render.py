"""Multi-chip MPI rendering via ``shard_map`` over a device mesh.

Two TPU-native sharding strategies for the renderer (the BASELINE north-star
generalization of the reference's single-GPU ``chunk_n_planes`` /
``batch_split`` memory knobs, ``gmpi/eval/vis/render_video.py:55-77``,
``gmpi/train.py:503-518``):

* **Tile sharding** — output pixel rows sharded across chips; plane textures
  replicated.  Embarrassingly parallel (zero collectives): each chip warps and
  composites all planes for its row block.  Scales rays/s linearly as long as
  the texture fits in HBM.

* **Plane sharding** — the plane axis sharded across chips; each chip
  composites its contiguous front-to-back slab into premultiplied partials
  ``(color_pre, depth_pre, transmittance)`` and the ordered over-combine
  ``(c_f + T_f * c_b, d_f + T_f * d_b, T_f * T_b)`` runs across chips on ICI
  (`lax.all_gather` + an ordered fold — exact, because slab compositing is
  associative).  Scales the *memory* axis: 96+ planes at 1024² without
  per-chip replication of the warped stack.

Both are differentiable end-to-end (gradients flow to the sharded RGBA).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gmpi_tpu.core.renderer import (
    RenderOutput,
    combine_segments,
    render_mpi,
    render_slab_partial,
)


def ordered_allcombine(part, axis: str):
    """Ordered cross-chip segment combine in log2(n) butterfly steps.

    ``combine_segments`` is associative but not commutative (front-to-back
    over-compositing), so each butterfly exchange orders its pair by shard
    index: after step k every chip holds the ordered product of its
    2^(k+1)-chip group; after log2(n) steps, the full composite — with
    log2(n) x partial bytes over ICI instead of ``all_gather``'s (n-1) x,
    and log2(n) folds instead of every chip redundantly folding all n
    (the all-gather version also serializes the fold after the collective;
    butterfly steps interleave transfer and combine).
    """
    n = jax.lax.axis_size(axis)
    assert n & (n - 1) == 0, f"butterfly combine needs power-of-two shards, got {n}"
    idx = jax.lax.axis_index(axis)
    k = 1
    while k < n:
        perm = [(i, i ^ k) for i in range(n)]
        recv = tuple(lax.ppermute(t, axis, perm) for t in part)
        front_first = (idx & k) == 0
        # select operands, then fold once (folding both orders and selecting
        # the result would double the combine FLOPs)
        front = tuple(jnp.where(front_first, a, b) for a, b in zip(part, recv))
        back = tuple(jnp.where(front_first, b, a) for a, b in zip(part, recv))
        part = combine_segments(front, back)
        k *= 2
    return part


def render_mpi_tile_sharded(
    mesh: Mesh,
    rgba: jnp.ndarray,  # [V, L, 4, Th, Tw]  (replicated)
    dhw: jnp.ndarray,  # [L, 3]
    ray_dir: jnp.ndarray,  # [V, 3, H, W]  (sharded on H)
    eye_pos: jnp.ndarray,  # [V, 3]
    z_dir: jnp.ndarray,  # [V, 3]
    axis: str = "tile",
    align_corners: bool = True,
    tiled_bands=None,
    render_fn=None,
    with_disp: bool = False,
) -> RenderOutput:
    """Render with output pixel rows sharded over ``axis``.

    ``ray_dir`` must be (or will be) sharded along its H dimension; the
    returned color/depth are sharded the same way.  ``tiled_bands`` selects
    the tile-banded MXU warp per shard; ``render_fn(rgba, dhw, rays, eye, z)
    -> RenderOutput`` plugs in any single-chip renderer (e.g. the fused
    Pallas kernel from ``core.renderer.render_mpi_fused``) — SPMD, so its
    static config is shared by every shard.  ``with_disp`` additionally
    returns expected disparity (``render_fn`` must populate ``.disp``).
    """
    n_shards = mesh.shape[axis]
    h = ray_dir.shape[2]
    assert h % n_shards == 0, (h, n_shards)
    row_spec = P(None, None, axis, None)
    n_out = 3 if with_disp else 2

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), row_spec, P(), P()),
        out_specs=(row_spec,) * n_out,
        check_vma=False,
    )
    def _render(rgba_, dhw_, ray_dir_, eye_, zdir_):
        if render_fn is not None:
            out = render_fn(rgba_, dhw_, ray_dir_, eye_, zdir_)
        else:
            out = render_mpi(rgba_, dhw_, ray_dir_, eye_, zdir_, align_corners,
                             tiled_bands=tiled_bands)
        if with_disp:
            assert out.disp is not None, "render_fn must populate disp"
            return out.color, out.depth, out.disp
        return out.color, out.depth

    outs = _render(rgba, dhw, ray_dir, eye_pos, z_dir)
    return RenderOutput(color=outs[0], depth=outs[1],
                        disp=outs[2] if with_disp else None)


def render_mpi_plane_sharded(
    mesh: Mesh,
    rgba: jnp.ndarray,  # [V, L, 4, Th, Tw]  (sharded on L)
    dhw: jnp.ndarray,  # [L, 3]  (sharded on L)
    ray_dir: jnp.ndarray,  # [V, 3, H, W]
    eye_pos: jnp.ndarray,
    z_dir: jnp.ndarray,
    axis: str = "plane",
    align_corners: bool = True,
    tiled_bands=None,
    slab_fn=None,
    with_disp: bool = False,
) -> RenderOutput:
    """Render with the plane axis sharded over ``axis``; output replicated.

    Chip *i* holds planes ``[i*L/n, (i+1)*L/n)`` (front-to-back order),
    composites them locally, and the cross-chip ordered combine runs on the
    gathered slab partials.  ``slab_fn(rgba_slab, dhw_slab [L,3], rays, eye,
    z) -> (color_pre, depth_pre[, disp_pre], trans)`` plugs in the
    production slab renderer (``pallas_warp.make_fused_slab_renderer``, with
    a matching ``with_disp``); ``tiled_bands`` selects the banded MXU warp
    in the default path.  ``with_disp`` adds the expected-disparity partial
    through the same ordered combine.
    """
    n_shards = mesh.shape[axis]
    v, l_planes = rgba.shape[0], rgba.shape[1]
    h, w = ray_dir.shape[2], ray_dir.shape[3]
    assert l_planes % n_shards == 0, (l_planes, n_shards)
    n_out = 3 if with_disp else 2

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis), P(), P(), P()),
        out_specs=(P(),) * n_out,
        check_vma=False,
    )
    def _render(rgba_slab, dhw_slab, ray_dir_, eye_, zdir_):
        if slab_fn is not None:
            part = slab_fn(rgba_slab, dhw_slab, ray_dir_, eye_, zdir_)
            assert len(part) == n_out + 1, (len(part), with_disp)
        else:
            slab_dhw = jnp.broadcast_to(dhw_slab[None], (v, dhw_slab.shape[0], 3))
            part = render_slab_partial(rgba_slab, slab_dhw, ray_dir_, eye_, zdir_,
                                       align_corners, tiled_bands=tiled_bands,
                                       with_disp=with_disp)
        # Ordered cross-chip combine (plane order == mesh axis order):
        # log-depth butterfly when the axis is a power of two, else gather+fold
        if n_shards & (n_shards - 1) == 0:
            return ordered_allcombine(part, axis)[:-1]
        gathered = jax.tree_util.tree_map(
            lambda t: lax.all_gather(t, axis, axis=0), part
        )

        def body(carry, slab):
            return combine_segments(carry, slab), None

        init = tuple(jnp.zeros_like(x) for x in part[:-1]) + (
            jnp.ones_like(part[-1]),)
        carry, _ = lax.scan(body, init, gathered)
        return carry[:-1]

    outs = _render(rgba, dhw, ray_dir, eye_pos, z_dir)
    return RenderOutput(color=outs[0], depth=outs[1],
                        disp=outs[2] if with_disp else None)


def render_mpi_plane_sharded_pipelined(
    mesh: Mesh,
    rgba: jnp.ndarray,  # [V, L, 4, Th, Tw]  (global plane order, front first)
    dhw: jnp.ndarray,  # [L, 3]
    ray_dir: jnp.ndarray,  # [V, 3, H, W]
    eye_pos: jnp.ndarray,
    z_dir: jnp.ndarray,
    n_sub: int = 2,
    axis: str = "plane",
    align_corners: bool = True,
    tiled_bands=None,
    slab_fn=None,
    with_disp: bool = False,
) -> RenderOutput:
    """Plane-sharded render with the cross-chip combine *pipelined* against
    the warp (``docs/SCALING.md``; VERDICT r2 #6).

    The global plane axis is split into ``n_sub`` front-to-back *super-slabs*,
    each sharded over the ``axis`` chips, so every chip warps a piece of every
    super-slab.  Per super-slab k the chips butterfly-combine their partials
    (``ordered_allcombine``) — and because super-slab k+1's warp has no data
    dependency on super-slab k's exchange, XLA's async collectives overlap
    the ICI hop of slab k with the warp compute of slab k+1 (double-buffered
    ``lax.scan`` carry holding the not-yet-combined partial).

    Trade-off vs :func:`render_mpi_plane_sharded`: the exchanged partials are
    full-image ``(color, depth, T)`` regardless of slab size, so total ICI
    volume grows by ``n_sub`` x — pipelining pays when one super-slab's warp
    time exceeds one butterfly (warp is O(L/n/n_sub) planes of texture work;
    the butterfly is O(log n) image-sized hops).  Exact: over-compositing is
    associative over contiguous slabs, and the (super-slab, chip, local-plane)
    order below is exactly the global front-to-back plane order.
    """
    n_shards = mesh.shape[axis]
    v, l_planes = rgba.shape[0], rgba.shape[1]
    h, w = ray_dir.shape[2], ray_dir.shape[3]
    assert l_planes % (n_shards * n_sub) == 0, (l_planes, n_shards, n_sub)
    c = l_planes // (n_shards * n_sub)

    # global plane g = k*(n*c) + i*c + j  ->  chip i, super-slab k, local j:
    # reshape [L] -> [S, N, c], move N outermost so shard_map can split it
    rgba_r = rgba.reshape(v, n_sub, n_shards, c, *rgba.shape[2:]).swapaxes(1, 2)
    dhw_r = dhw.reshape(n_sub, n_shards, c, 3).swapaxes(0, 1)

    n_out = 3 if with_disp else 2

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis), P(), P(), P()),
        out_specs=(P(),) * n_out,
        check_vma=False,
    )
    def _render(rgba_loc, dhw_loc, ray_dir_, eye_, zdir_):
        # rgba_loc [V, 1, S, c, 4, Th, Tw]; scan over the S super-slabs
        rgba_s = rgba_loc[:, 0].swapaxes(0, 1)       # [S, V, c, 4, Th, Tw]
        dhw_s = dhw_loc[0]                           # [S, c, 3]

        def sub_partial(rgba_k, dhw_k):
            if slab_fn is not None:
                return slab_fn(rgba_k, dhw_k, ray_dir_, eye_, zdir_)
            slab_dhw = jnp.broadcast_to(dhw_k[None], (v, c, 3))
            return render_slab_partial(rgba_k, slab_dhw, ray_dir_, eye_, zdir_,
                                       align_corners, tiled_bands=tiled_bands,
                                       with_disp=with_disp)

        pending0 = sub_partial(rgba_s[0], dhw_s[0])  # prologue: warp slab 0
        init_acc = tuple(jnp.zeros_like(x) for x in pending0[:-1]) + (
            jnp.ones_like(pending0[-1]),)

        def body(carry, xs):
            acc, pending = carry
            rgba_k, dhw_k = xs
            # the two lines below are data-independent: the warp of slab k
            # can run while slab k-1's butterfly is on the wire
            part_k = sub_partial(rgba_k, dhw_k)
            combined = ordered_allcombine(pending, axis)
            return (combine_segments(acc, combined), part_k), None

        (acc, pending), _ = lax.scan(body, (init_acc, pending0),
                                     (rgba_s[1:], dhw_s[1:]))
        return combine_segments(acc, ordered_allcombine(pending, axis))[:-1]

    outs = _render(rgba_r, dhw_r, ray_dir, eye_pos, z_dir)
    return RenderOutput(color=outs[0], depth=outs[1],
                        disp=outs[2] if with_disp else None)


def render_mpi_plane_tile_sharded(
    mesh: Mesh,
    rgba: jnp.ndarray,
    dhw: jnp.ndarray,
    ray_dir: jnp.ndarray,
    eye_pos: jnp.ndarray,
    z_dir: jnp.ndarray,
    plane_axis: str = "plane",
    tile_axis: str = "tile",
    align_corners: bool = True,
    tiled_bands=None,
    slab_fn=None,
    with_disp: bool = False,
) -> RenderOutput:
    """2-D sharding: planes over ``plane_axis`` x pixel rows over ``tile_axis``.

    Each (plane, tile) chip warps its slab for its rows; the ordered combine
    reduces over the plane axis only, leaving outputs row-sharded.
    """
    n_plane = mesh.shape[plane_axis]
    n_tile = mesh.shape[tile_axis]
    v, l_planes = rgba.shape[0], rgba.shape[1]
    h, w = ray_dir.shape[2], ray_dir.shape[3]
    assert l_planes % n_plane == 0 and h % n_tile == 0
    row_spec = P(None, None, tile_axis, None)
    n_out = 3 if with_disp else 2

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, plane_axis), P(plane_axis), row_spec, P(), P()),
        out_specs=(row_spec,) * n_out,
        check_vma=False,
    )
    def _render(rgba_slab, dhw_slab, ray_dir_, eye_, zdir_):
        if slab_fn is not None:
            part = slab_fn(rgba_slab, dhw_slab, ray_dir_, eye_, zdir_)
            assert len(part) == n_out + 1, (len(part), with_disp)
        else:
            slab_dhw = jnp.broadcast_to(dhw_slab[None], (v, dhw_slab.shape[0], 3))
            part = render_slab_partial(rgba_slab, slab_dhw, ray_dir_, eye_, zdir_,
                                       align_corners, tiled_bands=tiled_bands,
                                       with_disp=with_disp)
        if n_plane & (n_plane - 1) == 0:
            return ordered_allcombine(part, plane_axis)[:-1]
        gathered = jax.tree_util.tree_map(
            lambda t: lax.all_gather(t, plane_axis, axis=0), part
        )

        def body(carry, slab):
            return combine_segments(carry, slab), None

        init = tuple(jnp.zeros_like(x) for x in part[:-1]) + (
            jnp.ones_like(part[-1]),)
        carry, _ = lax.scan(body, init, gathered)
        return carry[:-1]

    outs = _render(rgba, dhw, ray_dir, eye_pos, z_dir)
    return RenderOutput(color=outs[0], depth=outs[1],
                        disp=outs[2] if with_disp else None)
