import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from d2slam_tpu.ops.superpoint_stem_pallas import superpoint_stem, stem_reference
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (1, 64, 128)), jnp.float32)
p1 = {"w": jnp.asarray(rng.normal(0, .3, (3,3,1,64)), jnp.float32),
      "b": jnp.asarray(rng.normal(0, .1, (64,)), jnp.float32)}
p2 = {"w": jnp.asarray(rng.normal(0, .08, (3,3,64,64)), jnp.float32),
      "b": jnp.asarray(rng.normal(0, .1, (64,)), jnp.float32)}
a = np.asarray(superpoint_stem(img, p1, p2, interpret=True), np.float32)
b = np.asarray(stem_reference(img, p1, p2), np.float32)
err = np.abs(a - b)
print("RESULT interpret max err", err.max(), "mean", err.mean(),
      "bad frac", (err > 0.05).mean())
