"""Multi-chip rendering + training via jax.sharding.Mesh + shard_map.

The reference is single-GPU (SURVEY.md section 2.4: no distributed code);
this is the TPU-native scaling design from BASELINE.json's north star:

- mesh axis ``tiles``: the image's tile-row axis is sharded across devices —
  each chip rasterizes its own horizontal band of tiles (spatial/data
  parallelism; the analog of the CUDA grid over tiles, lifted to chips).
- gaussian parameters are REPLICATED; every chip preprocesses all gaussians
  (cheap vs. rasterization) and bins only the instances overlapping its
  band. 5M-gaussian primitive-sharding with per-band all_gather is the
  planned extension (parallel axis ``gauss``).
- loss: each chip composites its band, bands are all_gather'd along ICI for
  the SSIM window (11px halo), and parameter gradients arrive via the
  shard_map transpose of the replicated inputs = an automatic psum
  all-reduce, overlapped with backward by XLA's latency-hiding scheduler.

Collectives used: all_gather (band assembly), psum (grad all-reduce, loss
reduction) — all riding ICI within a slice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_splatting_with_eye_tracking_tpu.models import gaussian_model as gm
from gaussian_splatting_with_eye_tracking_tpu.ops import binning as binning_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import ssim as ssim_ops
from gaussian_splatting_with_eye_tracking_tpu.ops import tile_blend
from gaussian_splatting_with_eye_tracking_tpu.ops.projection import (
    CameraParams,
    Preprocessed,
    preprocess,
)
from gaussian_splatting_with_eye_tracking_tpu import renderer


def make_mesh(n_devices: Optional[int] = None, axis: str = "tiles") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _band_render(
    means3d, scales, quats, opacities, sh, active, means2d_offset,
    viewmatrix, projmatrix, campos, tan_fovx, tan_fovy,
    *, sh_degree, width, height, tile, max_instances_per_band, max_per_tile,
    grid_x, grid_y_local, n_bands, impl, axis,
):
    """Per-device: preprocess all gaussians, bin + composite own tile band.
    Runs inside shard_map; returns the local image band (3, band_h, W')."""
    d = jax.lax.axis_index(axis)
    cam = CameraParams(
        viewmatrix=viewmatrix, projmatrix=projmatrix, campos=campos,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy, width=width, height=height,
    )
    prep = preprocess(
        means3d, scales, quats, opacities, sh, sh_degree, cam,
        tile=tile, active_mask=active,
    )
    # clip each gaussian's tile rect to this device's band of tile rows
    y0 = d * grid_y_local
    # shift screen y into the band's local pixel frame (the blend kernels
    # compute pixel coords from local tile indices)
    means2d = prep.means2d + means2d_offset
    means2d = means2d - jnp.stack(
        [jnp.zeros((), jnp.float32), (y0 * tile).astype(jnp.float32)]
    )[None, :]
    rmin_y = jnp.clip(prep.rect_min[:, 1] - y0, 0, grid_y_local)
    rmax_y = jnp.clip(prep.rect_max[:, 1] - y0, 0, grid_y_local)
    tiles_touched = (prep.rect_max[:, 0] - prep.rect_min[:, 0]) * (rmax_y - rmin_y)
    # gate by the ORIGINAL liveness: culled/inactive rows carry garbage
    # rects (preprocess only zeroes tiles_touched/opacity), and without
    # this gate they resurrect here as zero-opacity instances that inflate
    # the lists and displace real instances under per-tile truncation
    tiles_touched = jnp.where(prep.tiles_touched > 0,
                              jnp.maximum(tiles_touched, 0), 0)
    local = prep._replace(
        # band-local means2d: the binning distance cull and the blend
        # kernels both work in the band's shifted pixel frame
        means2d=means2d,
        rect_min=jnp.stack([prep.rect_min[:, 0], rmin_y], -1),
        rect_max=jnp.stack([prep.rect_max[:, 0], rmax_y], -1),
        tiles_touched=tiles_touched.astype(jnp.int32),
    )
    if impl == "pallas":
        from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend

        color, final_t, aux = pallas_blend.render_tiles_pallas(
            local, means2d, grid_x, grid_y_local, tile, jnp.zeros(3),
            max_instances_per_band, max_instances_per_band,
        )
        overflow = aux[2]
    else:
        b = binning_ops.bin_gaussians(
            local, grid_x, grid_y_local, max_instances_per_band, tile_px=tile
        )
        color, final_t = tile_blend.render_tiles_jnp(
            means2d, local.conics, local.rgb, local.opacities,
            b.gauss_id, b.offsets, grid_x, grid_y_local, tile,
            jnp.zeros(3), max_per_tile=max_per_tile,
        )
        overflow = b.overflow
    return color, final_t, prep.radii, overflow[None]


def sharded_render(
    mesh: Mesh,
    state: gm.GaussianModelState,
    cam: CameraParams,
    bg: jnp.ndarray,
    *,
    max_sh_degree: int = 3,
    tile: int = 32,
    max_instances_per_band: int = 1 << 18,
    max_per_tile: int = 1024,
    impl: str = "auto",
):
    """Render with tiles sharded over the mesh. Returns (3, H, W) image."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    axis = mesh.axis_names[0]
    n_bands = mesh.devices.size
    grid_x = -(-cam.width // tile)
    grid_y = -(-cam.height // tile)
    grid_y_pad = -(-grid_y // n_bands) * n_bands
    grid_y_local = grid_y_pad // n_bands

    p = state.params
    sh = gm.get_sh(p) * renderer.sh_band_mask(state.sh_degree, max_sh_degree)[None, None, :]
    args = (
        p.xyz, gm.get_scaling(p), p.rotation, gm.get_opacity(p), sh,
        state.active, jnp.zeros((p.xyz.shape[0], 2)),
        cam.viewmatrix, cam.projmatrix, cam.campos,
        jnp.asarray(cam.tan_fovx, jnp.float32), jnp.asarray(cam.tan_fovy, jnp.float32),
    )

    fn = functools.partial(
        _band_render,
        sh_degree=max_sh_degree, width=cam.width, height=cam.height, tile=tile,
        max_instances_per_band=max_instances_per_band, max_per_tile=max_per_tile,
        grid_x=grid_x, grid_y_local=grid_y_local, n_bands=n_bands, impl=impl,
        axis=axis,
    )
    shmap = jax.shard_map(
        fn, mesh=mesh,
        in_specs=tuple(P() for _ in args),
        out_specs=(P(None, axis, None), P(axis, None), P(), P(axis)),
        check_vma=False,
    )
    color, final_t, radii, overflow = shmap(*args)
    color = color[:, : cam.height, : cam.width]
    final_t = final_t[: cam.height, : cam.width]
    color = color + final_t[None] * bg[:, None, None]
    return color, final_t, radii, overflow


def _band_composite_from_prep(
    prep: Preprocessed, means2d_offset,
    *, tile, max_instances_per_band, max_per_tile, grid_x, grid_y_local, impl,
    axis,
):
    """Bin + composite THIS device's tile band from full-length preprocessed
    arrays (replicated or all_gather'd). The band-local clipping of each
    gaussian's tile rect mirrors _band_render."""
    d = jax.lax.axis_index(axis)
    y0 = d * grid_y_local
    means2d = prep.means2d + means2d_offset
    means2d = means2d - jnp.stack(
        [jnp.zeros((), jnp.float32), (y0 * tile).astype(jnp.float32)]
    )[None, :]
    rmin_y = jnp.clip(prep.rect_min[:, 1] - y0, 0, grid_y_local)
    rmax_y = jnp.clip(prep.rect_max[:, 1] - y0, 0, grid_y_local)
    tiles_touched = (prep.rect_max[:, 0] - prep.rect_min[:, 0]) * (rmax_y - rmin_y)
    # gate by the ORIGINAL liveness: culled/inactive rows carry garbage
    # rects (preprocess only zeroes tiles_touched/opacity), and without
    # this gate they resurrect here as zero-opacity instances that inflate
    # the lists and displace real instances under per-tile truncation
    tiles_touched = jnp.where(prep.tiles_touched > 0,
                              jnp.maximum(tiles_touched, 0), 0)
    local = prep._replace(
        # band-local means2d: the binning distance cull and the blend
        # kernels both work in the band's shifted pixel frame
        means2d=means2d,
        rect_min=jnp.stack([prep.rect_min[:, 0], rmin_y], -1),
        rect_max=jnp.stack([prep.rect_max[:, 0], rmax_y], -1),
        tiles_touched=tiles_touched.astype(jnp.int32),
    )
    if impl == "pallas":
        from gaussian_splatting_with_eye_tracking_tpu.ops import pallas_blend

        color, final_t, aux = pallas_blend.render_tiles_pallas(
            local, means2d, grid_x, grid_y_local, tile, jnp.zeros(3),
            max_instances_per_band, max_instances_per_band,
        )
        overflow = aux[2]
    else:
        b = binning_ops.bin_gaussians(
            local, grid_x, grid_y_local, max_instances_per_band, tile_px=tile
        )
        color, final_t = tile_blend.render_tiles_jnp(
            means2d, local.conics, local.rgb, local.opacities,
            b.gauss_id, b.offsets, grid_x, grid_y_local, tile,
            jnp.zeros(3), max_per_tile=max_per_tile,
        )
        overflow = b.overflow
    return color, final_t, overflow[None]


def exchange_memory_bytes(n_local: int, n_bands: int, cap_exch: int,
                          multicast_bound: int = 0) -> int:
    """Per-device peak memory of one _band_exchange call, in bytes: the
    enumeration scratch (kmax slots of int32 keys + sort payloads, ~3
    int32 columns) plus the fixed (n_bands*cap_exch, 16)-f32 send AND recv
    blocks. This is the memory claim the primitive-sharded path makes vs
    the O(N) full-row all_gather it replaces (N_global * 16 * 4 bytes per
    device); asserted at BASELINE config-5 scale in
    tests/test_parallel.py::TestBandExchange::test_memory_math."""
    mb = n_bands if multicast_bound <= 0 else min(multicast_bound, n_bands)
    kmax = n_local * mb if n_bands > 1 else n_local
    enum_bytes = kmax * 3 * 4
    block_bytes = 2 * n_bands * cap_exch * _EXF * 4
    return enum_bytes + block_bytes


_SSIM_HALO = 5  # 11x11 window: ssim_map row y depends on rows [y-5, y+5]


def _band_local_loss(color_band, final_t_band, gt_band, bg, axis, n_bands,
                     width, height, band_h, lambda_dssim):
    """L1 + D-SSIM of the FULL image computed band-locally (VERDICT r2 #5:
    the previous path all_gather'd the complete image and ran full-image
    SSIM on every device — D-times redundant loss compute justified by an
    11 px window).

    Exact w.r.t. the full-image loss: the SSIM map at row y depends only on
    rows [y-5, y+5] (two radius-5 blurs of pointwise products), so a 5-row
    ppermute halo exchange suffices, and ppermute's unpaired edges deliver
    zeros = the conv's SAME zero padding at the image border. Rows/cols
    beyond the true image are zeroed before the exchange (so windows near
    the crop boundary see exactly what full-image zero padding sees) and
    masked out of every mean. Per-device loss compute drops from O(3 H W)
    to O(3 H W / D) + a 5-row halo; the only collectives are two 5-row
    ppermutes and three scalar psums.

    Returns (loss, l1, mse, color_band_composited); the scalar terms are
    identical (up to f32 reduction order) on every device.
    """
    from gaussian_splatting_with_eye_tracking_tpu.ops import ssim as ssim_ops_

    d = jax.lax.axis_index(axis)
    color = color_band + final_t_band[None] * bg[:, None, None]
    row = d * band_h + jnp.arange(band_h)
    rmask = (row < height)[None, :, None]
    cmask = (jnp.arange(color.shape[2]) < width)[None, None, :]
    mask = (rmask & cmask).astype(color.dtype)
    color = color * mask
    gt_band = gt_band * mask
    both = jnp.concatenate([color, gt_band], axis=0)  # (6, bh, W')
    h = _SSIM_HALO
    up = jax.lax.ppermute(both[:, band_h - h:, :], axis,
                          [(i, i + 1) for i in range(n_bands - 1)])
    down = jax.lax.ppermute(both[:, :h, :], axis,
                            [(i, i - 1) for i in range(1, n_bands)])
    ext = jnp.concatenate([up, both, down], axis=1)  # (6, bh+10, W')
    smap = ssim_ops_.ssim_map(ext[None, :3], ext[None, 3:])[0]
    smap = smap[:, h:h + band_h, :]
    npix = 3.0 * height * width
    ssim_sum = jax.lax.psum(jnp.sum(smap * mask), axis)
    diff = color - gt_band
    l1 = jax.lax.psum(jnp.sum(jnp.abs(diff)), axis) / npix
    mse = jax.lax.psum(jnp.sum(diff * diff), axis) / npix
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_sum / npix)
    return loss, l1, mse, color


def _pad_gt_bands(gt, n_bands, band_h, width_padded):
    """(3, H, W) ground truth -> (3, n_bands*band_h, width_padded)
    zero-padded so it shards evenly into per-device pixel bands
    (band_h = grid_y_local * tile rows per device)."""
    hp = n_bands * band_h
    return jnp.pad(
        gt, ((0, 0), (0, hp - gt.shape[1]), (0, width_padded - gt.shape[2])))


def shard_model_state(mesh: Mesh, state: gm.GaussianModelState) -> gm.GaussianModelState:
    """Place a GaussianModelState with every capacity-axis leaf sharded over
    the mesh (params, Adam moments, densification stats). Scalar leaves
    (sh_degree, optax counts) are replicated. Capacity must divide the mesh
    size (capacities are powers of two)."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    cap = state.params.xyz.shape[0]
    if cap % n:
        raise ValueError(f"capacity {cap} not divisible by mesh size {n}")

    def placer(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(placer, state)


_EXF = 16  # exchanged feature columns (15 used + valid flag)


def _band_exchange(prep_local, axis, n_bands, grid_y_local, cap_exch,
                   multicast_bound: int = 0):
    """Route each locally-preprocessed gaussian to every device whose tile
    band its rect intersects, via ONE capacity-bounded all_to_all.

    Per (src, dst) pair the payload is a fixed (cap_exch, 16) block — the
    ragged per-band lists are compacted into it (band enumeration exactly
    like tile binning, one band-keyed sort of n_local slots). Per-device
    traffic/memory is O(rows overlapping the band) = O(N/D) for uniform
    scenes, NOT O(N): this replaces the full preprocessed-row all_gather.
    Validity rides as column 15, so no separate count exchange. Returns
    (recv (n_bands*cap_exch, 16), overflow ()); the transpose routes
    gradient rows back to their owners (all_to_all is its own transpose).
    """
    n_local = prep_local.means2d.shape[0]
    live = prep_local.tiles_touched > 0
    b_lo = jnp.clip(prep_local.rect_min[:, 1] // grid_y_local, 0, n_bands - 1)
    b_hi = jnp.clip((jnp.maximum(prep_local.rect_max[:, 1], 1) - 1)
                    // grid_y_local, 0, n_bands - 1)
    counts = jnp.where(live, b_hi - b_lo + 1, 0)  # bands touched (multicast)

    # enumerate (gaussian, band) pairs: slot k -> (g, b_lo[g] + r).
    # multicast_bound caps how many bands one gaussian is assumed to span
    # (0 = exact bound n_bands). Typical gaussians span 1-2 bands, so large
    # meshes can set ~4 to shrink the enumeration sort; exceeding the bound
    # raises the overflow flag rather than truncating silently.
    mb = n_bands if multicast_bound <= 0 else min(multicast_bound, n_bands)
    kmax = n_local * mb if n_bands > 1 else n_local
    cum = jnp.cumsum(counts)
    total = cum[-1]
    excl = cum - counts
    mark = jnp.zeros(kmax, jnp.int32).at[excl].add(
        jnp.where(counts > 0, 1, 0), mode="drop")
    g_of = jnp.clip(jnp.cumsum(mark) - 1, 0, n_local - 1)
    k_iota = jnp.arange(kmax, dtype=jnp.int32)
    valid = k_iota < total
    band = b_lo[g_of] + (k_iota - excl[g_of])
    band = jnp.where(valid, band, n_bands)  # sentinel sorts to the back
    # stable (band, gaussian) order via one packed key; trace-time headroom
    # guard: bits(n_bands sentinel) + gbits must stay inside int32's sign
    # bit or the shift corrupts routing order (binning.py's analogous case
    # falls back to a 2-key sort; band counts are small enough to assert)
    gbits = max(1, (n_local - 1).bit_length())
    if n_bands.bit_length() + gbits > 31:
        raise ValueError(
            f"band-exchange key overflow: {n_bands} bands x {n_local} local "
            f"rows needs {n_bands.bit_length() + gbits} bits > 31; shrink "
            "the per-device shard or add an unsigned-order XOR")
    key = (band << gbits) | (g_of & ((1 << gbits) - 1))
    _, slot_sorted, band_sorted = jax.lax.sort(
        (key, g_of, band), num_keys=1)
    off = jnp.searchsorted(
        band_sorted, jnp.arange(n_bands + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    per_band = off[1:] - off[:-1]
    overflow = jnp.any(per_band > cap_exch) | (total > kmax)

    # dst slot s = b*C + j sources sorted slot off[b] + j (j < per_band[b])
    s_iota = jnp.arange(n_bands * cap_exch, dtype=jnp.int32)
    s_b = s_iota // cap_exch
    s_j = s_iota % cap_exch
    s_valid = s_j < per_band[s_b]
    src = jnp.where(s_valid, off[s_b] + s_j, 0)
    g_src = slot_sorted[jnp.clip(src, 0, kmax - 1)]

    cols = jnp.concatenate([
        prep_local.means2d,
        prep_local.conics,
        prep_local.rgb,
        prep_local.opacities[:, None],
        prep_local.depths[:, None],
        prep_local.cull_thr[:, None],
        prep_local.rect_min.astype(jnp.float32),
        prep_local.rect_max.astype(jnp.float32),
        jnp.ones((n_local, 1), jnp.float32),
    ], axis=1)  # (n_local, 16)
    send = cols[g_src] * s_valid[:, None].astype(jnp.float32)
    send = send.reshape(n_bands, cap_exch, _EXF)
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    recv = recv.reshape(n_bands * cap_exch, _EXF)
    overflow = jax.lax.pmax(overflow, axis)
    return recv, overflow


def _prep_from_exchange(recv):
    """Reassemble a band-candidate Preprocessed from exchanged rows.
    Invalid rows get an empty rect (zero tiles) and zero opacity."""
    v = recv[:, 15] > 0.5
    rect_min = recv[:, 11:13].astype(jnp.int32)
    rect_max = jnp.where(v[:, None], recv[:, 13:15].astype(jnp.int32),
                         rect_min)
    tiles = jnp.where(
        v,
        (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1]),
        0,
    ).astype(jnp.int32)
    return Preprocessed(
        means2d=recv[:, 0:2],
        depths=jnp.where(v, recv[:, 9], 0.0),
        conics=recv[:, 2:5],
        rgb=recv[:, 5:8],
        opacities=jnp.where(v, recv[:, 8], 0.0),
        radii=tiles,  # placeholder; densify stats use the OWNER's radii
        tiles_touched=tiles,
        rect_min=rect_min,
        rect_max=rect_max,
        cull_thr=jnp.where(v, recv[:, 10], 0.0),
    )


def make_gauss_sharded_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    opt,
    max_sh_degree: int,
    width: int,
    height: int,
    *,
    tile: int = 32,
    max_instances_per_band: int = 1 << 18,
    max_per_tile: int = 1024,
    max_exchange_per_band: int = 1 << 16,
    exchange_multicast_bound: int = 0,
    impl: str = "auto",
    loss_mode: str = "band",
):
    """PRIMITIVE-SHARDED training step for scenes too large to replicate
    (BASELINE config 5: 5M+ gaussians).

    Layout: gaussian parameters + Adam moments + densification stats are
    sharded over the mesh's single axis (each device owns capacity/D rows);
    the image's tile-row bands ride the SAME axis (device d renders band d).
    Per step, each device:

      1. preprocesses its own gaussian shard (SH eval + EWA projection —
         the O(N) FLOPs and the 59-floats/gaussian parameter reads are
         sharded),
      2. exchanges compact preprocessed rows with ONE capacity-bounded
         all_to_all, each row multicast only to the bands its tile rect
         overlaps (_band_exchange): per-device memory and ICI traffic are
         O(rows-overlapping-band) ~ N/D, not O(N),
      3. bins + composites its tile band; the loss is band-local with a
         5-row SSIM-halo ppermute (_band_local_loss; loss_mode="full"
         restores the all_gather + full-image SSIM path for parity tests).

    Memory at BASELINE config 5 (5M gaussians, 64 devices, 1080p): local
    shard 78k rows; exchanged rows ~1.3 * 78k * 64 B ~ 6.5 MB/device/step
    vs 320 MB for the full-row all_gather it replaces.

    The backward transposes: band-gather -> band-scatter, all_to_all ->
    reverse all_to_all of exchanged-row gradients (each device reduces only
    its own shard's rows), then local preprocess backward -> param grads
    stay sharded. Adam updates run on local rows only; no parameter
    all-reduce ever materializes. Pass state through
    shard_model_state(mesh, ...) first.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    axis = mesh.axis_names[0]
    n_bands = mesh.devices.size
    grid_x = -(-width // tile)
    grid_y = -(-height // tile)
    grid_y_pad = -(-grid_y // n_bands) * n_bands
    grid_y_local = grid_y_pad // n_bands

    def device_loss(params, offset, active, sh_degree, cam_arrays, gt, bg):
        """Inside shard_map: params/offset/active are the LOCAL shard."""
        cam = CameraParams(
            viewmatrix=cam_arrays[0], projmatrix=cam_arrays[1],
            campos=cam_arrays[2], tan_fovx=cam_arrays[3], tan_fovy=cam_arrays[4],
            width=width, height=height,
        )
        sh = gm.get_sh(params) * renderer.sh_band_mask(sh_degree, max_sh_degree)[None, None, :]
        prep_local = preprocess(
            params.xyz, gm.get_scaling(params), params.rotation,
            gm.get_opacity(params), sh, max_sh_degree, cam,
            tile=tile, active_mask=active,
        )
        prep_local = prep_local._replace(
            means2d=prep_local.means2d + offset
        )
        # route rows to the devices whose band they overlap: O(N/D)
        # received rows per device instead of the O(N) full all_gather
        # (the all_to_all's transpose routes grad rows back to owners)
        recv, ex_overflow = _band_exchange(
            prep_local, axis, n_bands, grid_y_local, max_exchange_per_band,
            exchange_multicast_bound,
        )
        prep = _prep_from_exchange(recv)
        color_band, final_t_band, overflow = _band_composite_from_prep(
            prep, jnp.zeros_like(prep.means2d),
            tile=tile, max_instances_per_band=max_instances_per_band,
            max_per_tile=max_per_tile, grid_x=grid_x, grid_y_local=grid_y_local,
            impl=impl, axis=axis,
        )
        if loss_mode == "band":
            loss, l1, mse, _ = _band_local_loss(
                color_band, final_t_band, gt, bg, axis, n_bands,
                width, height, grid_y_local * tile, opt.lambda_dssim,
            )
        else:
            color_full = jax.lax.all_gather(color_band, axis, axis=1, tiled=True)
            color_full = color_full[:, :height, :width]
            final_t_full = jax.lax.all_gather(final_t_band, axis, axis=0, tiled=True)
            color_full = color_full + final_t_full[None, :height, :width] * bg[:, None, None]
            l1 = jnp.mean(jnp.abs(color_full - gt))
            ssim_v = ssim_ops.ssim(color_full, gt)
            loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim_v)
            mse = jnp.mean((color_full - gt) ** 2)
        overflow = overflow | ex_overflow
        return loss, (l1, mse, prep_local.radii, overflow)

    gt_spec = P(None, axis, None) if loss_mode == "band" else P()
    sharded_loss = jax.shard_map(
        device_loss, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), (P(),) * 5, gt_spec, P()),
        out_specs=(P(), (P(), P(), P(axis), P(axis))),
        check_vma=False,
    )

    @jax.jit
    def train_step(state, viewmatrix, projmatrix, campos, tan_fovx, tan_fovy,
                   gt, bg, accumulate_stats):
        cam_arrays = (viewmatrix, projmatrix, campos,
                      jnp.asarray(tan_fovx, jnp.float32),
                      jnp.asarray(tan_fovy, jnp.float32))
        cap = state.params.xyz.shape[0]
        offset0 = jnp.zeros((cap, 2))
        gt_in = (_pad_gt_bands(gt, n_bands, grid_y_local * tile, grid_x * tile)
                 if loss_mode == "band" else gt)

        def loss_fn(params, offset):
            return sharded_loss(
                params, offset, state.active, state.sh_degree, cam_arrays,
                gt_in, bg
            )

        (loss, (l1, mse, radii, overflow)), (g_params, g_offset) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, offset0
            )
        )
        updates, opt_state = tx.update(g_params, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state._replace(params=params, opt_state=opt_state)
        state = jax.lax.cond(
            accumulate_stats,
            lambda s: gm.add_densification_stats(
                s, g_offset, radii, width=width, height=height
            ),
            lambda s: s,
            state,
        )
        return state, {
            "loss": loss, "l1": l1,
            "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)),
            "overflow": jnp.any(overflow),
        }

    return train_step


def make_sharded_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    opt,
    max_sh_degree: int,
    width: int,
    height: int,
    *,
    tile: int = 32,
    max_instances_per_band: int = 1 << 18,
    max_per_tile: int = 1024,
    impl: str = "auto",
    loss_mode: str = "band",
):
    """Full sharded training step: per-band rasterize -> band-local loss
    (5-row SSIM halo ppermute, _band_local_loss) -> backward (grad psum via
    shard_map transpose) -> Adam.

    ``loss_mode="full"`` keeps the previous full-image path (every device
    all_gathers the image and runs full-image SSIM) for parity testing."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    axis = mesh.axis_names[0]
    n_bands = mesh.devices.size
    grid_x = -(-width // tile)
    grid_y = -(-height // tile)
    grid_y_pad = -(-grid_y // n_bands) * n_bands
    grid_y_local = grid_y_pad // n_bands
    band_h = grid_y_local * tile
    width_pad = grid_x * tile

    band_fn = functools.partial(
        _band_render,
        sh_degree=max_sh_degree, width=width, height=height, tile=tile,
        max_instances_per_band=max_instances_per_band, max_per_tile=max_per_tile,
        grid_x=grid_x, grid_y_local=grid_y_local, n_bands=n_bands, impl=impl,
        axis=axis,
    )

    def device_loss(params, offset, active, sh_degree, cam_arrays, gt, bg):
        """Runs inside shard_map (params replicated, image band local; in
        band mode ``gt`` arrives as this device's band slice)."""
        sh = gm.get_sh(params) * renderer.sh_band_mask(sh_degree, max_sh_degree)[None, None, :]
        color_band, final_t_band, radii, overflow = band_fn(
            params.xyz, gm.get_scaling(params), params.rotation,
            gm.get_opacity(params), sh, active, offset, *cam_arrays
        )
        if loss_mode == "band":
            loss, l1, mse, _ = _band_local_loss(
                color_band, final_t_band, gt, bg, axis, n_bands,
                width, height, band_h, opt.lambda_dssim,
            )
        else:
            color_full = jax.lax.all_gather(color_band, axis, axis=1, tiled=True)
            color_full = color_full[:, :height, :width]
            final_t_full = jax.lax.all_gather(final_t_band, axis, axis=0, tiled=True)
            color_full = color_full + final_t_full[None, :height, :width] * bg[:, None, None]
            l1 = jnp.mean(jnp.abs(color_full - gt))
            ssim_v = ssim_ops.ssim(color_full, gt)
            loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim_v)
            mse = jnp.mean((color_full - gt) ** 2)
        return loss, (l1, mse, radii, overflow)

    gt_spec = P(None, axis, None) if loss_mode == "band" else P()
    sharded_loss = jax.shard_map(
        device_loss, mesh=mesh,
        in_specs=(P(), P(), P(), P(), (P(),) * 5, gt_spec, P()),
        out_specs=(P(), (P(), P(), P(), P(axis))),
        check_vma=False,
    )

    @jax.jit
    def train_step(state, viewmatrix, projmatrix, campos, tan_fovx, tan_fovy,
                   gt, bg, accumulate_stats):
        cam_arrays = (viewmatrix, projmatrix, campos,
                      jnp.asarray(tan_fovx, jnp.float32),
                      jnp.asarray(tan_fovy, jnp.float32))
        cap = state.params.xyz.shape[0]
        offset0 = jnp.zeros((cap, 2))
        gt_in = (_pad_gt_bands(gt, n_bands, band_h, width_pad)
                 if loss_mode == "band" else gt)

        def loss_fn(params, offset):
            return sharded_loss(
                params, offset, state.active, state.sh_degree, cam_arrays,
                gt_in, bg
            )

        (loss, (l1, mse, radii, overflow)), (g_params, g_offset) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, offset0
            )
        )
        updates, opt_state = tx.update(g_params, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state._replace(params=params, opt_state=opt_state)
        state = jax.lax.cond(
            accumulate_stats,
            lambda s: gm.add_densification_stats(
                s, g_offset, radii, width=width, height=height
            ),
            lambda s: s,
            state,
        )
        return state, {
            "loss": loss, "l1": l1,
            "psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-10)),
            "overflow": jnp.any(overflow),
        }

    return train_step
