"""Frontend CNN benchmark driver.

TPU-native counterpart of the reference's loop_tensorrt_test
(reference: d2frontend/tests/loop_tensorrt_test.cpp:13-80 — standalone
SuperPoint / NetVLAD / SuperGlue timing on an image pair over N runs
with match counting). Runs each stage jitted on the default backend and
reports mean latency.

    PYTHONPATH=. python examples/bench_frontend.py [--runs 50] [--cpu]
    PYTHONPATH=. python examples/bench_frontend.py --sp-onnx sp.onnx
"""
import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=50)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--kpts", type=int, default=200)
    ap.add_argument("--sp-onnx", default=None,
                    help="SuperPoint ONNX export to load instead of the "
                         "random-init JAX model")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from d2slam_tpu.frontend.matching import match_descriptors
    from d2slam_tpu.frontend.netvlad import (
        NetVLADConfig, netvlad_apply, netvlad_init,
    )
    from d2slam_tpu.frontend.superglue import (
        SuperGlueConfig, superglue_init, superglue_match,
    )
    from d2slam_tpu.frontend.superpoint import (
        SuperPointConfig, superpoint_extract, superpoint_init,
    )

    H, W = args.hw
    print(f"backend: {jax.default_backend()}  image {H}x{W}  "
          f"runs {args.runs}")
    rng = np.random.RandomState(0)
    img_a = jnp.asarray(rng.rand(H, W), jnp.float32)
    img_b = jnp.asarray(rng.rand(H, W), jnp.float32)

    def bench(name, fn, *xs):
        y = fn(*xs)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(args.runs):
            y = fn(*xs)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / args.runs * 1e3
        print(f"{name:<28} {dt:8.3f} ms")
        return y

    sp_cfg = SuperPointConfig(max_keypoints=args.kpts, threshold=-1.0)
    if args.sp_onnx:
        from d2slam_tpu.frontend.superpoint import superpoint_from_onnx

        apply_fn, sp_params = superpoint_from_onnx(args.sp_onnx)
        sp = jax.jit(lambda im: superpoint_extract(
            sp_params, im, sp_cfg, apply_fn=apply_fn))
    else:
        sp_params = superpoint_init(jax.random.PRNGKey(0), sp_cfg)
        sp = jax.jit(lambda im: superpoint_extract(sp_params, im, sp_cfg))
    out_a = bench("superpoint extract", sp, img_a)
    out_b = sp(img_b)

    nv_cfg = NetVLADConfig()
    nv_params = netvlad_init(jax.random.PRNGKey(1), nv_cfg)
    nv = jax.jit(lambda im: netvlad_apply(nv_params, im[None, :, :, None],
                                          nv_cfg))
    bench("netvlad global desc", nv, img_a)

    # match_descriptors is already a shape-bucketed jitted wrapper —
    # calling it under an outer jit would trace its host-side padding
    m = bench("knn ratio matching", match_descriptors,
              out_a.desc, out_b.desc, out_a.valid, out_b.valid)

    sg_cfg = SuperGlueConfig()
    sg_params = superglue_init(jax.random.PRNGKey(2), sg_cfg)
    hw = jnp.asarray([H, W], jnp.float32)
    sg = jax.jit(lambda ka, da, sa, va, kb, db, sb, vb: superglue_match(
        sg_params, ka, da, sa, va, kb, db, sb, vb, hw, sg_cfg))
    try:
        bench("superglue matching", sg, out_a.kpts, out_a.desc,
              out_a.scores, out_a.valid, out_b.kpts, out_b.desc,
              out_b.scores, out_b.valid)
    except TypeError:
        print("superglue matching          (skipped: signature mismatch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
