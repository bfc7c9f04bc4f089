import numpy as np, jax, jax.numpy as jnp
from d2slam_tpu.ops.superpoint_stem_pallas import superpoint_stem, stem_reference
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (2, 480, 640)), jnp.float32)
p1 = {"w": jnp.asarray(rng.normal(0, .3, (3,3,1,64)), jnp.float32),
      "b": jnp.asarray(rng.normal(0, .1, (64,)), jnp.float32)}
p2 = {"w": jnp.asarray(rng.normal(0, .08, (3,3,64,64)), jnp.float32),
      "b": jnp.asarray(rng.normal(0, .1, (64,)), jnp.float32)}
a = np.asarray(superpoint_stem(img, p1, p2), np.float32)
b = np.asarray(stem_reference(img, p1, p2), np.float32)
err = np.abs(a - b)
bad = err > 0.05
print("RESULT bad fraction", bad.mean())
ys, xs = np.where(bad[0].any(-1))[0], np.where(bad[0].any(-1))[1]
if len(ys):
    print("RESULT bad rows uniq", np.unique(ys)[:20], "... count", len(np.unique(ys)))
    print("RESULT bad cols uniq", np.unique(xs)[:20], "... count", len(np.unique(xs)))
    print("RESULT row hist at tile bounds (mod 4):", np.bincount(np.unique(ys) % 4))
else:
    print("RESULT image 0 clean; img1 bad?", bad[1].mean())
