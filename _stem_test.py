import time, numpy as np, jax, jax.numpy as jnp
from d2slam_tpu.ops.superpoint_stem_pallas import superpoint_stem, stem_reference
from d2slam_tpu.utils.tpu_profile import profile_device_program

rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (4, 480, 640)), jnp.float32)
p1 = {"w": jnp.asarray(rng.normal(0, .3, (3,3,1,64)), jnp.float32),
      "b": jnp.asarray(rng.normal(0, .1, (64,)), jnp.float32)}
p2 = {"w": jnp.asarray(rng.normal(0, .08, (3,3,64,64)), jnp.float32),
      "b": jnp.asarray(rng.normal(0, .1, (64,)), jnp.float32)}

ref = jax.jit(stem_reference)
a = np.asarray(superpoint_stem(img, p1, p2), np.float32)
b = np.asarray(ref(img, p1, p2), np.float32)
err = np.abs(a - b)
den = np.maximum(np.abs(b), 1.0)
print("RESULT shapes", a.shape, b.shape, "max abs err", err.max(),
      "max rel", (err/den).max(), "mean", err.mean())

f = jax.jit(lambda im: superpoint_stem(im, p1, p2))
jax.block_until_ready(f(img))
prof = profile_device_program(f, (img,), iters=10)
print("RESULT pallas stem", {k: round(v,3) if isinstance(v,float) else v for k,v in (prof or {}).items()})
prof2 = profile_device_program(ref, (img, p1, p2), iters=10)
print("RESULT xla stem", {k: round(v,3) if isinstance(v,float) else v for k,v in (prof2 or {}).items()})
