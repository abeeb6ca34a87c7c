"""Fused inference engine — ONE XLA program: uint8 image in, uint8 mask out.

Reference: src/engine/inference.py (SURVEY.md §2#9, §3.3). The reference
pipeline is host-heavy: cv2 BGR->RGB, numpy normalize (``prepare_img``),
pad-to-stride, H2D copy, forward, ``F.interpolate`` of logits to input
size, argmax, D2H. The north star (BASELINE.json) requires the whole
chain fused on-device so host<->TPU traffic is a single uint8 image in
and a single uint8 mask out per frame.

TPU-first design:
  * normalize/pad/forward/upsample/argmax trace into one ``jit`` — XLA
    fuses the uint8->bf16 normalize into the stem conv's input pipeline
    and the argmax into the upsample matmuls' epilogue;
  * the final bilinear upsample is the two-matmul formulation
    (segtpu.core.resize) so it runs on the MXU instead of gather units;
  * compute in bfloat16 (weights cast at trace time, f32 accumulation
    via ``preferred_element_type`` defaults), final argmax in f32 —
    mIoU-neutral in practice, toggleable with ``compute_dtype``;
  * static shape buckets: one compiled program per (H, W, batch) bucket
    (512x512 VOC, 360x480 CamVid, 2048x1024 CityScapes — the driver's
    three dataset configs), cached on the ``Segmenter`` object;
  * input buffers are donated so XLA reuses the uint8 staging buffer
    across frames.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from segtpu.core.resize import resize_bilinear
from segtpu.models.segmenter import segmenter_apply
from segtpu.utils.helpers import IMG_MEAN, IMG_STD, IMG_SCALE

STRIDE = 32  # encoder output stride — pad-to-stride rule

# A/B knob for the fused Pallas front (kernels.front), read ONCE at
# import time (the value is baked into jitted programs at trace time)
_FUSED_FRONT = os.environ.get("SEGTPU_FUSED_FRONT", "1") != "0"


def pad_to_stride(hw: Tuple[int, int], stride: int = STRIDE) -> Tuple[int, int]:
    h, w = hw
    return (-(-h // stride) * stride, -(-w // stride) * stride)


def _normalize_on_device(img_u8, compute_dtype):
    """uint8 [N,H,W,3] -> normalized activations. Exact same arithmetic
    as utils.helpers.prepare_img, traced on-device."""
    x = img_u8.astype(jnp.float32) * IMG_SCALE
    x = (x - jnp.asarray(IMG_MEAN)) / jnp.asarray(IMG_STD)
    return x.astype(compute_dtype)


_S2D_PERM_CACHE: Dict[str, Tuple] = {}


def _s2d_perm_mats():
    """0/1 matrices expressing the 2x2 space-to-depth lane shuffle as
    two MXU matmuls over 384-lane blocks (64 pixels x 6 = lcm(6, 128)
    values): in lane 6j+q of row 2i+dy -> out lane 12j + dy*6 + q.
    Each output has exactly ONE nonzero term, so the bf16 matmul is
    EXACT on uint8 values (all integers <= 255 are representable)."""
    if "p" not in _S2D_PERM_CACHE:
        p0 = np.zeros((384, 768), np.float32)
        p1 = np.zeros((384, 768), np.float32)
        for j in range(64):
            for q in range(6):
                p0[6 * j + q, 12 * j + q] = 1.0
                p1[6 * j + q, 12 * j + 6 + q] = 1.0
        _S2D_PERM_CACHE["p"] = (p0, p1)
    return _S2D_PERM_CACHE["p"]


def _normalize_s2d(img_u8, compute_dtype):
    """uint8 [N,H,W,3] (H, W even) -> normalized space-to-depth
    [N,H/2,W/2,12]. The 2x2-patch layout turns the C=3 normalize +
    3-input-channel stem conv into 12-channel work (4x better VPU/MXU
    lane occupancy); numerically identical to _normalize_on_device +
    encoders.space_to_depth.

    For W % 128 == 0 the byte shuffle runs as two exact permutation
    matmuls on the MXU (see _s2d_perm_mats) — XLA's native lowering of
    the transpose materializes two f32 copies of the full-res image
    (profiled at 15.2 ms vs 5.9 ms for 8x1024x2048 on v5e)."""
    from segtpu.models.encoders import space_to_depth
    n, h, w, _ = img_u8.shape
    mean12 = np.tile(np.asarray(IMG_MEAN, np.float32), 4)
    std12 = np.tile(np.asarray(IMG_STD, np.float32), 4)
    if w % 128 == 0:
        # (A K=768 single dot folding the even/odd row split into the
        # contraction was tried in round 3: the [n, h/2, 2, k, 384] u8
        # reshape made XLA assign pathological layouts — 4.6 + 2.8 ms
        # of u8 copies at 1024x2048 b8. The two-dot form's strided row
        # slices cost 0.43 ms. Keep the two-dot form.)
        xb = img_u8.reshape(n, h, (w * 3) // 384, 384)
        xe = xb[:, 0::2].astype(jnp.bfloat16)
        xo = xb[:, 1::2].astype(jnp.bfloat16)
        p0, p1 = _s2d_perm_mats()
        if compute_dtype == jnp.bfloat16:
            # fold the whole normalize into the permutation: P' = P *
            # scale/std (per output channel) and bias = -mean/std. Each
            # output keeps exactly ONE nonzero term; the only deviation
            # from the f32 arithmetic below is bf16 rounding of the
            # folded scale (<= ~1 ulp of the bf16 result) — and it
            # removes two full-res f32 layout copies XLA otherwise
            # materializes around the elementwise normalize (profiled
            # ~2.4 ms per batch-8 dispatch at 1024x2048 on v5e).
            scale = np.tile(IMG_SCALE / std12[:12], 64)      # [768]
            # bias added in the [.., 768] pre-reshape layout so it fuses
            # into the matmul epilogue (adding after the reshape made
            # XLA materialize a 1.5 ms full-res layout copy)
            bias = jnp.asarray(np.tile(-mean12 / std12, 64), jnp.bfloat16)
            p0s = jnp.asarray(p0 * scale, jnp.bfloat16)
            p1s = jnp.asarray(p1 * scale, jnp.bfloat16)
            y = (jnp.einsum("nhkp,pq->nhkq", xe, p0s)
                 + jnp.einsum("nhkp,pq->nhkq", xo, p1s) + bias)
            return y.reshape(n, h // 2, w // 2, 12).astype(compute_dtype)
        y = (jnp.einsum("nhkp,pq->nhkq", xe, jnp.asarray(p0, jnp.bfloat16))
             + jnp.einsum("nhkp,pq->nhkq", xo, jnp.asarray(p1, jnp.bfloat16)))
        y = y.reshape(n, h // 2, w // 2, 12)
    else:
        y = space_to_depth(img_u8)
    x = y.astype(jnp.float32) * IMG_SCALE
    return ((x - jnp.asarray(mean12)) / jnp.asarray(std12)).astype(
        compute_dtype)


def _normalize_s2d_chw(img_u8, compute_dtype, hw: Optional[Tuple[int, int]]
                       = None):
    """uint8 [N,H,W,3] (or row-flat [N,H,W*3], or PAIR-BLOCKED
    [N,H/2,(W*6)//768,768] — both staged views need ``hw``) ->
    normalized CHW s2d planes [N,12,H/2,W/2] for the full-CHW Pallas
    encoder (models.fast_encoder.mbv2_chw_apply). Per-channel
    permutation matmuls write each channel plane directly in its final
    flat-pixel layout — no NHWC tensor (and no 12->128 lane padding)
    ever exists. Same arithmetic as _normalize_s2d.

    The pair-blocked form (w %% 256 == 0 only) is a FREE host reshape of
    the contiguous HWC bytes — record i holds full-res rows 2i and 2i+1
    — and is already the einsum operand shape: the jitted program does
    no u8 relayout at all (the row-flat form still paid a ~0.27 ms
    [N,H,8,768] reshape copy per b8 dispatch at 1024x2048), and the
    even/odd row split becomes a contiguous block slice instead of a
    stride-2 row slice.

    Round-3 form (w % 256 == 0): the jitted program takes the ROW-FLAT
    [N,H,W*3] image — XLA assigned the 4-D parameter a pathological
    layout and spent ~0.43 ms/b8-dispatch re-laying it out — and each
    channel uses ONE [768,128]-block permutation per row parity (a
    channel's sources live entirely in even OR odd full-res rows, so
    half of the former per-channel einsum pairs multiplied by
    identically-zero matrices; and the [.., k, 128] einsum output is an
    exact (8,128)-tile shape, where the former 64-lane chunks tiled
    half-padded). (The K=768-single-dot + plane-major-columns +
    transpose variant was tried in round 3 and REGRESSED — the 5-D u8
    reshape drew pathological XLA layouts, 9.4 ms of front vs 1.9 for
    this form.)"""
    blocked = None
    if img_u8.ndim == 4 and img_u8.shape[-1] == 768:
        n = img_u8.shape[0]
        h, w = int(hw[0]), int(hw[1])
        assert w % 256 == 0 and img_u8.shape[1] == h // 2
        blocked = img_u8
        imgf = None
    elif img_u8.ndim == 4:
        n, h, w, _ = img_u8.shape
        imgf = img_u8.reshape(n, h, w * 3)
    else:
        n, h, _ = img_u8.shape
        w = int(hw[1])
        imgf = img_u8
    mean12 = np.tile(np.asarray(IMG_MEAN, np.float32), 4)
    std12 = np.tile(np.asarray(IMG_STD, np.float32), 4)
    scale = IMG_SCALE / std12
    fold_bf16 = compute_dtype == jnp.bfloat16
    p0, p1 = _s2d_perm_mats()
    if w % 256 == 0:
        if blocked is not None:
            k = (w * 3) // 768
            xe = blocked[:, :, :k].astype(jnp.bfloat16)
            xo = blocked[:, :, k:].astype(jnp.bfloat16)
        else:
            xb = imgf.reshape(n, h, (w * 3) // 768, 768)
            xe = xb[:, 0::2].astype(jnp.bfloat16)
            xo = xb[:, 1::2].astype(jnp.bfloat16)
        planes = []
        for c in range(12):
            # channel c = (row parity dy = c//6, px parity + rgb = c%6):
            # sources are entirely in rows of ONE parity
            src = xe if c < 6 else xo
            pc = (p0 if c < 6 else p1)[:, np.arange(64) * 12 + c]  # [384,64]
            p2 = np.zeros((768, 128), np.float32)
            p2[:384, :64] = pc
            p2[384:, 64:] = pc
            if fold_bf16:
                # production path: fold scale/bias into the permutation
                # (<= ~1 ulp of the bf16 result, as in _normalize_s2d)
                p2m = jnp.asarray(p2 * scale[c], jnp.bfloat16)
                bias = jnp.asarray(-mean12[c] / std12[c], jnp.bfloat16)
                yc = jnp.einsum("nhkp,pq->nhkq", src, p2m) + bias
            else:
                yc = jnp.einsum("nhkp,pq->nhkq", src,
                                jnp.asarray(p2, jnp.bfloat16))
                yc = (yc.astype(jnp.float32) * np.float32(IMG_SCALE)
                      - np.float32(mean12[c])) / np.float32(std12[c])
            planes.append(yc.reshape(n, h // 2, w // 2))
        return jnp.stack(planes, axis=1).astype(compute_dtype)
    img4 = imgf.reshape(n, h, w, 3)
    if w % 128 == 0:
        xb = img4.reshape(n, h, (w * 3) // 384, 384)
        xe = xb[:, 0::2].astype(jnp.bfloat16)
        xo = xb[:, 1::2].astype(jnp.bfloat16)
        planes = []
        for c in range(12):
            cols = np.arange(64) * 12 + c
            src = xe if c < 6 else xo
            pc = (p0 if c < 6 else p1)[:, cols]
            if fold_bf16:
                pcm = jnp.asarray(pc * scale[c], jnp.bfloat16)
                bias = jnp.asarray(-mean12[c] / std12[c], jnp.bfloat16)
                yc = jnp.einsum("nhkp,pq->nhkq", src, pcm) + bias
            else:
                yc = jnp.einsum("nhkp,pq->nhkq", src,
                                jnp.asarray(pc, jnp.bfloat16))
                yc = (yc.astype(jnp.float32) * np.float32(IMG_SCALE)
                      - np.float32(mean12[c])) / np.float32(std12[c])
            planes.append(yc.reshape(n, h // 2, w // 2))
        return jnp.stack(planes, axis=1).astype(compute_dtype)
    from segtpu.models.encoders import space_to_depth
    y = space_to_depth(img4).astype(jnp.float32) * IMG_SCALE
    y = (y - jnp.asarray(mean12)) / jnp.asarray(std12)
    return jnp.transpose(y, (0, 3, 1, 2)).astype(compute_dtype)


def build_infer_fn(genotype, *, num_classes: int, input_hw: Tuple[int, int],
                   batch: Optional[int] = None, align_corners: bool = True,
                   compute_dtype=jnp.bfloat16, return_logits: bool = False,
                   use_pallas: Optional[bool] = None,
                   flat_tail: Optional[bool] = None,
                   pallas_interpret: bool = False):
    """Compile-ready fused inference function for one shape bucket.

    Returns ``infer(params, stats, img_u8)`` where img_u8 is
    uint8 [H,W,3] (batch=None) or [N,H,W,3]; result is a uint8 mask of
    the same spatial shape (or f32 full-res logits if return_logits).

    use_pallas: route the upsample+argmax tail through the fused Pallas
    kernel (segtpu.kernels.upsample_argmax) — the full-res logit tensor
    never touches HBM. Defaults to True on TPU, False elsewhere.

    flat_tail: None = auto (kernels.upsample_argmax.flat_tail_profitable);
    tests override to pin one tail variant (the two are equal up to the
    f32 order of the separable W/H interps — tie pixels can flip).
    """
    h, w = int(input_hw[0]), int(input_hw[1])
    hp, wp = pad_to_stride((h, w))
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # space-to-depth stem fast path needs even input dims (pad-to-stride
    # margins stay normalized-zero in both paths, preserving parity)
    use_s2d = h % 2 == 0 and w % 2 == 0

    def _prep_nhwc(img):
        if use_s2d:
            x = _normalize_s2d(img, compute_dtype)
            x = jnp.pad(x, ((0, 0), (0, (hp - h) // 2),
                            (0, (wp - w) // 2), (0, 0)))
            return x, "s2d12"
        x = _normalize_on_device(img, compute_dtype)
        # zero-pad bottom/right to the stride multiple (reference
        # rule: pad the normalized image; open item SURVEY.md §7.4.3)
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        return x, "nhwc3"

    def infer(params, stats, img_u8):
        # img_u8 is [N,H,W,3] / [H,W,3], ROW-FLAT [N,H,W*3] / [H,W*3]
        # (last dim != 3), or PAIR-BLOCKED [N,H/2,(W*6)//768,768]
        # (batched only; w % 256 == 0). The staged forms are the
        # production fast path — XLA gives the 4-D [.,H,W,3] uint8
        # parameter a pathological layout and re-lays it out on device,
        # and even the row-flat form pays a [N,H,8,768] u8 reshape copy
        # (~0.27 ms/b8 at 1024x2048); the pair-blocked form IS the
        # einsum operand shape, so no device-side u8 relayout exists.
        # Only one of the views below is consumed per path; XLA DCEs
        # the others.
        blocked = img_u8.ndim == 4 and img_u8.shape[-1] == 768
        flat = not blocked and img_u8.shape[-1] != 3
        nd_batched = 3 if flat else 4
        imgb = img_u8 if img_u8.ndim == nd_batched else img_u8[None]
        img = (imgb.reshape(imgb.shape[0], h, w, 3)
               if (flat or blocked) else imgb)
        if use_pallas and not return_logits:
            # Fast path: full-CHW Pallas pipeline. Round 1 kept the XLA
            # NHWC encoder (the then-kernels lost); with the round-2
            # kernel fixes (dx-major + mask-after-dy-sum, trimmed halos,
            # stride-2 quadrant kernel) the CHW encoder avoids XLA's
            # C->128-lane-padded NHWC activations entirely (up to 10.7x
            # HBM inflation at the early stages). Decoder and tail were
            # CHW already; taps now arrive channel-first, transpose-free.
            from segtpu.kernels.upsample_argmax import upsample_argmax
            from segtpu.models.families import infer_family
            from segtpu.models.fast_decoder import (
                build_fast_decoder, build_fast_template_decoder)
            if use_s2d:
                if (blocked and _FUSED_FRONT and hp == h and wp == w
                        and compute_dtype == jnp.bfloat16):
                    # fused Pallas front (kernels.front): one uint8 read,
                    # 12 MXU permutation dots, one flat CHW write —
                    # replaces the XLA einsum+stack (bit-identical, see
                    # front.py; 0.72 ms stack relayout + einsum HBM
                    # round trip removed)
                    from segtpu.kernels.front import normalize_s2d_front
                    x12 = normalize_s2d_front(
                        imgb, hw=(h, w), out_dtype=compute_dtype,
                        interpret=pallas_interpret
                    ).reshape(imgb.shape[0], 12, h // 2, w // 2)
                else:
                    x12 = _normalize_s2d_chw(imgb if (flat or blocked)
                                             else img, compute_dtype,
                                             hw=(h, w))
                    x12 = jnp.pad(x12, ((0, 0), (0, 0),
                                        (0, (hp - h) // 2),
                                        (0, (wp - w) // 2)))
                from segtpu.models.fast_encoder import mbv2_chw_apply
                taps = mbv2_chw_apply(params["encoder"], stats["encoder"],
                                      x12, interpret=pallas_interpret)
                taps_cf = True
            else:
                from segtpu.models.encoders import mbv2_apply
                x, fmt = _prep_nhwc(img)
                taps, _ = mbv2_apply(params["encoder"], stats["encoder"],
                                     x, train=False, input_format=fmt)
                taps_cf = False
            build = (build_fast_decoder
                     if infer_family(genotype).name == "micro"
                     else build_fast_template_decoder)
            # one-line engagement record (VERDICT r4 next#4): which
            # fast-decoder family the Pallas path materialized
            import logging
            logging.getLogger("segtpu.engine").info(
                "pallas infer: family=%s builder=%s hw=%s",
                infer_family(genotype).name, build.__name__, (h, w))
            # flat tail: decoder logits stay in the kernels' flat
            # (C-sublane, px-lane) layout and feed the W-first
            # upsample+argmax kernel retile-free (the 4-D interface
            # forced a 0.288 ms (C,px)->(h,w) copy per b8 dispatch);
            # engaged only where the A/B says it wins (narrow widths —
            # see kernels.upsample_argmax.flat_tail_profitable)
            from segtpu.kernels.upsample_argmax import flat_tail_profitable
            use_flat = (flat_tail_profitable(wp // 4) if flat_tail is None
                        else flat_tail)
            dec = build(genotype, params["decoder"], stats["decoder"],
                        align_corners=align_corners,
                        taps_channel_first=taps_cf,
                        flat_logits=use_flat,
                        interpret=pallas_interpret)
            if use_flat:
                from segtpu.kernels.upsample_argmax import \
                    upsample_argmax_flat
                logits_flat, dec_hw = dec(taps)
                out = upsample_argmax_flat(
                    logits_flat, dec_hw, (hp, wp), crop_hw=(h, w),
                    align_corners=align_corners,
                    # tile_r swept on hardware (scripts/ab_tail.py):
                    # 256 beats 64 by ~4% at both engaged shapes
                    tile_r=8 if pallas_interpret else 256,
                    interpret=pallas_interpret)
            else:
                logits_cf = dec(taps)
                out = upsample_argmax(
                    logits_cf, (hp, wp), crop_hw=(h, w),
                    align_corners=align_corners, channel_first=True,
                    # small tiles in interpret mode (CPU tests on tiny
                    # maps); 512-row tiles on TPU for tall outputs
                    # (swept: 2.26 -> 2.02 ms per b8 dispatch)
                    tile_h=32 if pallas_interpret else
                    (512 if h >= 512 else 128),
                    interpret=pallas_interpret)
            return out if img_u8.ndim == nd_batched else out[0]
        x, fmt = _prep_nhwc(img)
        logits, _, _ = segmenter_apply(genotype, params, stats, x,
                                       train=False,
                                       align_corners=align_corners,
                                       input_format=fmt)
        if return_logits:
            logits = resize_bilinear(logits.astype(jnp.float32), (hp, wp),
                                     align_corners=align_corners,
                                     compute_dtype=jnp.float32)
            out = logits[:, :h, :w, :]
        elif use_pallas:
            from segtpu.kernels.upsample_argmax import upsample_argmax
            # the kernel's interp matrices are built for the padded grid
            # and cropped to (h, w) rows/cols — equal to up-then-crop
            out = upsample_argmax(logits, (hp, wp), crop_hw=(h, w),
                                  align_corners=align_corners)
        else:
            logits = resize_bilinear(logits.astype(jnp.float32), (hp, wp),
                                     align_corners=align_corners,
                                     compute_dtype=jnp.float32)
            out = jnp.argmax(logits[:, :h, :w, :], axis=-1).astype(jnp.uint8)
        return out if img_u8.ndim == nd_batched else out[0]

    return infer


def build_sharded_pallas_infer(genotype, *, num_classes: int,
                               input_hw: Tuple[int, int], n_shards: int,
                               axis_name: str = "space",
                               align_corners: bool = True,
                               compute_dtype=jnp.bfloat16,
                               pallas_interpret: bool = False):
    """Spatially-sharded (H over mesh axis ``axis_name``) variant of the
    full-CHW Pallas fast path, for use inside ``shard_map`` (wired up by
    parallel.mesh.make_sharded_infer_fn(mode='space', use_pallas=True)).

    Pallas custom calls are opaque to XLA's SPMD partitioner, so the
    sharding is explicit manual SPMD (SURVEY.md §5.7):
      * front + encoder run shard-local with overlap-discard halo
        exchange per block (fast_encoder._halo_exchange — one ppermute
        of 1-2 boundary rows per block, bit-exact vs unsharded);
      * the MICRO decoder runs H-sharded too (VERDICT r3 next#3 — the
        round-3 engine all-gathered the taps and replicated decoder +
        tail, an Amdahl cap of ~2.3x at 8 shards): cells overlap-
        discard per op/pair kernel, GAP branches psum, resizes apply
        per-shard interpolation bands; blocks too small for one-hop
        halos (the low-res ~6%% of decoder px) compute replicated —
        see fast_decoder.build_fast_decoder(spatial=...);
      * the tail computes ONLY its own H/n output rows from the
        all-gathered stride-4 logits (tiny: 5 MB bf16 at 1024x2048x19)
        via per-shard banded interp rows
        (kernels.upsample_argmax.upsample_argmax_sharded).
    The TEMPLATE family keeps the round-3 replicated-decoder layout
    (all-gathered taps) with the sharded tail.

    Returns ``infer_local(params, stats, img_local)`` mapping the local
    uint8 [N, H/n, W, 3] slice -> local uint8 [N, H/n, W] mask slice.
    """
    h, w = int(input_hw[0]), int(input_hw[1])
    hp, wp = pad_to_stride((h, w))
    if (hp, wp) != (h, w):
        raise ValueError(
            f"sharded pallas inference needs stride-{STRIDE}-multiple "
            f"shapes, got {h}x{w} (pad on host or use mode='data')")
    if h % (2 * n_shards):
        raise ValueError(f"H={h} must divide 2*n_shards={2 * n_shards}")
    if (h // n_shards) % 2 or w % 2:
        raise ValueError("sharded s2d front needs even local H and W")

    from segtpu.kernels.upsample_argmax import upsample_argmax
    from segtpu.models.families import infer_family
    from segtpu.models.fast_decoder import (
        build_fast_decoder, build_fast_template_decoder)
    from segtpu.models.fast_encoder import mbv2_chw_apply

    micro = infer_family(genotype).name == "micro"

    def infer_local(params, stats, img_local):
        assert img_local.ndim == 4, "sharded inference takes [N,H/n,W,3]"
        from segtpu.kernels.upsample_argmax import upsample_argmax_sharded
        x12 = _normalize_s2d_chw(img_local, compute_dtype)
        taps = mbv2_chw_apply(params["encoder"], stats["encoder"], x12,
                              spatial_axis=axis_name,
                              interpret=pallas_interpret)
        if micro:
            dec = build_fast_decoder(
                genotype, params["decoder"], stats["decoder"],
                align_corners=align_corners, taps_channel_first=True,
                spatial=(axis_name, n_shards), interpret=pallas_interpret)
            logits_local = dec(taps)     # [B, K, (h/4)/n, w/4]
        else:
            taps = [jax.lax.all_gather(t, axis_name, axis=2, tiled=True)
                    for t in taps]
            dec = build_fast_template_decoder(
                genotype, params["decoder"], stats["decoder"],
                align_corners=align_corners, taps_channel_first=True,
                interpret=pallas_interpret)
            logits_full = dec(taps)
            lq = logits_full.shape[2] // n_shards
            logits_local = jax.lax.dynamic_slice_in_dim(
                logits_full, jax.lax.axis_index(axis_name) * lq, lq,
                axis=2)
        return upsample_argmax_sharded(
            logits_local, (h, w), axis_name=axis_name, n_shards=n_shards,
            align_corners=align_corners,
            tile_h=32 if pallas_interpret else (512 if h >= 512 else 128),
            interpret=pallas_interpret)

    return infer_local


def _stage_u8(img_u8: np.ndarray):
    """Host-side staging of a uint8 [..,H,W,3] image/batch into the
    fastest accepted input form of build_infer_fn's jitted program —
    all forms are FREE numpy views of the contiguous HWC bytes.
    Returns (staged, squeeze): squeeze marks a single image staged with
    an added batch dim (the pair-blocked form is batched-only).

    * H even and W % 256 == 0 -> PAIR-BLOCKED [N,H/2,(W*6)//768,768]:
      already the front's einsum operand shape, zero device-side u8
      relayout (see _normalize_s2d_chw).
    * otherwise -> ROW-FLAT [..,H,W*3]: the 4-D parameter draws a
      pathological XLA layout and a device-side relayout copy.
    """
    h, w = img_u8.shape[-3:-1]
    single = img_u8.ndim == 3
    if h % 2 == 0 and w % 256 == 0:
        lead = (1,) if single else img_u8.shape[:-3]
        return (img_u8.reshape(lead + (h // 2, (w * 6) // 768, 768)),
                single)
    return img_u8.reshape(img_u8.shape[:-2] + (-1,)), False


class Segmenter:
    """User-facing inference API (reference: engine/inference segmenter API).

    >>> seg = Segmenter(genotype, params, stats, num_classes=19)
    >>> mask = seg.predict(img_u8)          # uint8 [H,W,3] -> uint8 [H,W]
    >>> masks = seg.predict_batch(imgs_u8)  # uint8 [N,H,W,3]

    Each distinct input shape compiles once and is cached; weights are
    placed on device once at construction.
    """

    def __init__(self, genotype, params, stats, *, num_classes: int,
                 align_corners: bool = True, compute_dtype=jnp.bfloat16,
                 device=None):
        self.genotype = genotype
        self.num_classes = num_classes
        self.align_corners = align_corners
        self.compute_dtype = compute_dtype
        # per-shape-bucket programs are minutes of cold compile; make
        # them compile once per machine (persistent cache, VERDICT r2 #5)
        from segtpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        device = device or jax.devices()[0]
        self._params = jax.device_put(params, device)
        self._stats = jax.device_put(stats, device)
        self._device = device
        self._cache: Dict[Tuple, object] = {}

    def _compiled(self, hw: Tuple[int, int], return_logits: bool,
                  staged_shape: Tuple[int, ...]):
        """Per-(shape-bucket, staged-batch-shape) compiled program,
        served from the on-disk AOT store (segtpu.utils.aot) when a
        matching export exists — a warm process skips the minutes of
        Python tracing per bucket (VERDICT r3 next#6). Exports are
        shape-specialized, so the staged input shape is in the key."""
        key = (hw, return_logits, tuple(staged_shape))
        if key not in self._cache:
            fn = build_infer_fn(self.genotype, num_classes=self.num_classes,
                                input_hw=hw, align_corners=self.align_corners,
                                compute_dtype=self.compute_dtype,
                                return_logits=return_logits)
            # note: the uint8 input is not donated — its shape/dtype never
            # matches an output buffer, so donation only produces warnings
            from segtpu.utils.aot import aot_jit
            img = jax.ShapeDtypeStruct(tuple(staged_shape), jnp.uint8)
            akey = repr((self.genotype, self.num_classes, hw,
                         self.align_corners, str(self.compute_dtype),
                         return_logits, tuple(staged_shape)))
            self._cache[key] = aot_jit(fn, akey, self._params,
                                       self._stats, img)
        return self._cache[key]

    def predict(self, img_u8, *, return_logits: bool = False):
        """Single image or batch; blocks and returns numpy."""
        img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
        hw = img_u8.shape[-3:-1]
        staged, squeeze = _stage_u8(img_u8)
        fn = self._compiled((int(hw[0]), int(hw[1])), return_logits,
                            staged.shape)
        out = fn(self._params, self._stats,
                 jax.device_put(staged, self._device))
        out = np.asarray(out)
        return out[0] if squeeze else out

    predict_batch = predict

    def predict_stream(self, images):
        """Streaming inference with transfer/compute overlap: while the
        TPU runs frame i, frame i+1 is already being H2D-copied (the
        reference has no equivalent — it syncs per frame)."""
        def _stage(im):
            im = np.ascontiguousarray(im, np.uint8)
            hw = im.shape[-3:-1]
            staged, squeeze = _stage_u8(im)
            return (jax.device_put(staged, self._device), hw, squeeze)

        it = iter(images)
        try:
            nxt = _stage(next(it))
        except StopIteration:
            return
        pending = None
        while nxt is not None:
            cur, hw, squeeze = nxt
            try:
                nxt = _stage(next(it))
            except StopIteration:
                nxt = None
            fn = self._compiled((int(hw[0]), int(hw[1])), False,
                                cur.shape)
            out = fn(self._params, self._stats, cur)
            out = out[0] if squeeze else out
            if pending is not None:
                yield np.asarray(pending)
            pending = out
        if pending is not None:
            yield np.asarray(pending)
