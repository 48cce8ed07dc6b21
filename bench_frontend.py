"""Phase-level profiling of the frame-build path on the real chip.

Times each device kernel of build_frame in isolation (median over reps,
block_until_ready per rep) plus the composed extract_orb / extract_box_orb /
build_pyramid, to attribute the frame.build cost measured by bench_e2e.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from textslam_tpu.ops import fast, orb, pyramid, rasterize
from textslam_tpu import config as cfgmod


def bench(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    rng = np.random.default_rng(0)
    H, W = 480, 640
    img = jnp.asarray(rng.random((H, W), np.float32))
    cfg = cfgmod.TextSLAMConfig()

    print(f"device: {jax.devices()[0]}")

    # full composites
    full = bench(lambda im: orb.extract_orb(
        im, n_features=cfg.orb.n_features, n_levels=cfg.orb.n_levels,
        scale=cfg.orb.scale_factor, threshold=float(cfg.orb.fast_threshold_min)), img)
    print(f"extract_orb (composite): {full:.2f} ms")

    D = cfg.text.max_detections_per_frame
    quads = np.zeros((D, 4, 2), np.float32)
    qv = np.zeros(D, bool)
    for i in range(6):
        u0, v0 = rng.integers(50, W - 150), rng.integers(50, H - 120)
        quads[i] = [[u0, v0], [u0 + 90, v0], [u0 + 90, v0 + 40], [u0, v0 + 40]]
        qv[i] = True
    box = bench(lambda im, q, v: orb.extract_box_orb(
        im, q, v, n_keep=cfg.orb.n_box_features,
        threshold=float(cfg.orb.fast_threshold_min),
        shrink=cfg.orb.box_boundary_margin), img, jnp.asarray(quads), jnp.asarray(qv))
    print(f"extract_box_orb (composite): {box:.2f} ms")

    n_lv = max(cfg.pyramid.init_ba_levels) + 1
    def pyr(im):
        imgs, grads = pyramid.build_pyramid(im, levels=n_lv)
        return pyramid.pack_pyramid(imgs, grads)["data"]
    print(f"build+pack pyramid (composite): {bench(pyr, img):.2f} ms")

    # pieces at level 0 shape
    fsm = jax.jit(lambda im: fast.nms3(fast.fast_score_map(im, 7.0)))
    print(f"fast_score_map+nms3 @L0: {bench(fsm, img):.2f} ms")
    smap = fsm(img)
    sel = jax.jit(lambda s: orb.select_keypoints(s, 217, cell=16))
    print(f"select_keypoints(217) @L0: {bench(sel, smap):.2f} ms")
    uv, sc, val = sel(smap)
    ic = jax.jit(orb.ic_angle)
    print(f"ic_angle(217) @L0: {bench(ic, img, uv):.2f} ms")
    gb = jax.jit(orb.gauss_blur7)
    print(f"gauss_blur7 @L0: {bench(gb, img):.2f} ms")
    blurred = gb(img)
    ang = ic(img, uv)
    bd = jax.jit(orb.brief_descriptors)
    print(f"brief_descriptors(217) @L0: {bench(bd, blurred, uv, ang):.2f} ms")
    rs = jax.jit(lambda im: jax.image.resize(im, (400, 533), method="bilinear"))
    print(f"resize L0->L1: {bench(rs, img):.2f} ms")

    # box-orb pieces
    qm = jax.jit(lambda q, v: (jax.vmap(lambda qq: rasterize.quad_mask(qq, H, W))(q)
                               & v[:, None, None]).any(0))
    print(f"quad_mask x{D}: {bench(qm, jnp.asarray(quads), jnp.asarray(qv)):.2f} ms")
    sel2 = jax.jit(lambda s: orb.select_keypoints(s, cfg.orb.n_box_features, cell=8))
    print(f"select_keypoints({cfg.orb.n_box_features}, cell=8) @L0: {bench(sel2, smap):.2f} ms")

    # quad_stats: the text-BA build hot spot, full-image vs what a windowed
    # variant would cost
    NP = 320
    tq = np.zeros((NP, 4, 2), np.float32)
    for i in range(NP):
        u0, v0 = rng.integers(10, W - 120), rng.integers(10, H - 60)
        tq[i] = [[u0, v0], [u0 + 90, v0], [u0 + 90, v0 + 40], [u0, v0 + 40]]
    imgs_k = jnp.asarray(rng.random((32, H, W), np.float32))
    tgt = jnp.asarray(rng.integers(0, 32, NP).astype(np.int32))
    qsf = jax.jit(lambda ims, ti, q: jax.vmap(
        lambda t, qq: rasterize.quad_stats(ims[t], qq)[:2])(ti, q))
    print(f"quad_stats full-image x{NP}: {bench(qsf, imgs_k, tgt, jnp.asarray(tq)):.2f} ms")


if __name__ == "__main__":
    main()
