import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, kernel, x_shape, out_shape, check=None):
    try:
        x = jnp.asarray(np.random.default_rng(0).normal(size=x_shape), jnp.float32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        out = np.asarray(out)
        ok = "OK" if check is None else ("OK+CORRECT" if check(np.asarray(x), out) else "OK but WRONG")
        print("RESULT", name, ok)
    except Exception as e:
        print("RESULT", name, "FAIL:", str(e).split("\n")[0][:90])

# A: sublane-offset (lane-aligned) minor insert
def kA(x_ref, o_ref):
    p = x_ref[3:37, 0:644]
    o_ref[:] = p[:, :, None] * jnp.ones((64,), jnp.float32)[None, None, :]
probe("sublane-off-minor-insert", kA, (40, 648), (34, 644, 64))

# B: sublane split reshape [16, 644, 64] -> [16, 322, 2, 64] + index 0
def kB(x_ref, o_ref):
    a = x_ref[:].reshape(16, 322, 2, 64)
    o_ref[:] = a[:, :, 0, :]
probe("sublane-split+idx", kB, (16, 644, 64), (16, 322, 64),
      check=lambda x, o: np.allclose(o, x.reshape(16,322,2,64)[:, :, 0, :]))

# C: max of two sublane-offset slices (elementwise with offset)
def kC(x_ref, o_ref):
    o_ref[:] = jnp.maximum(x_ref[0:16, 0:643, :], x_ref[0:16, 1:644, :])
probe("offset-elementwise-max", kC, (16, 644, 64), (16, 643, 64),
      check=lambda x, o: np.allclose(o, np.maximum(x[:16,0:643], x[:16,1:644])))

# D: the full pool pattern [32, 644, 64] -> [16, 320, 64]
def kD(x_ref, o_ref):
    x = x_ref[:]
    rp = jnp.max(x.reshape(16, 2, 644, 64), axis=1)          # row pool
    m = jnp.maximum(rp[:, 0:643, :], rp[:, 1:644, :])        # adjacent col max
    mp = jnp.concatenate([m, jnp.zeros((16, 1, 64), jnp.float32)], axis=1)
    sel = mp.reshape(16, 322, 2, 64)[:, :, 0, :]             # even cols
    o_ref[:] = sel[:, 0:320, :]
def ref_pool(x):
    a = x.reshape(16, 2, 322, 2, 64)  # wrong ref; compute straightforwardly
    x4 = x.reshape(16, 2, 644, 64)
    rp = x4.max(1)
    cp = np.maximum(rp[:, 0:643:1][:, ::2][:, :320], rp[:, 1:644:1][:, ::2][:, :320])
    return cp
probe("full-2x2-pool", kD, (32, 644, 64), (16, 320, 64),
      check=lambda x, o: np.allclose(o, ref_pool(x)))
