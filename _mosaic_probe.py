import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, kernel, x_shape=(40, 648), out_shape=(34, 644, 64)):
    try:
        x = jnp.ones(x_shape, jnp.float32)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        jax.block_until_ready(out)
        print("RESULT", name, "OK")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print("RESULT", name, "FAIL:", msg)

# 1: aligned minor insert
def k1(x_ref, o_ref):
    p = x_ref[0:34, 0:644]
    o_ref[:] = p[:, :, None] * jnp.ones((64,), jnp.float32)[None, None, :]
probe("aligned-minor-insert", k1)

# 2: offset minor insert
def k2(x_ref, o_ref):
    p = x_ref[1:35, 1:645]
    o_ref[:] = p[:, :, None] * jnp.ones((64,), jnp.float32)[None, None, :]
probe("offset-minor-insert", k2)

# 3: roll then aligned insert
def k3(x_ref, o_ref):
    x = pltpu.roll(x_ref[:], 647, axis=1)
    p = x[0:34, 0:644]
    o_ref[:] = p[:, :, None] * jnp.ones((64,), jnp.float32)[None, None, :]
probe("roll-aligned-insert", k3)

# 4: sublane-merge reshape [64, 32, 640] -> [64, 20480]
def k4(x_ref, o_ref):
    a = x_ref[:].reshape(64, 32 * 640)
    o_ref[:] = a.reshape(64, 32, 640)
probe("sublane-lane-merge", k4, x_shape=(64, 32, 640), out_shape=(64, 32, 640))

# 5: 3d dot_general contract major dim [64c,TH,W] x [64c,64o]
def k5(x_ref, o_ref):
    a = x_ref[:]
    w = jnp.ones((64, 64), jnp.float32)
    o_ref[:] = jax.lax.dot_general(w, a, dimension_numbers=(((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
probe("3d-dot-major-contract", k5, x_shape=(64, 32, 640), out_shape=(64, 32, 640))

# 6: strided lane slice (pool cols)
def k6(x_ref, o_ref):
    o_ref[:] = x_ref[:][:, ::2]
probe("lane-stride2", k6, x_shape=(64, 640), out_shape=(64, 320))

# 7: reshape split minor [32, 640] -> [32, 320, 2]
def k7(x_ref, o_ref):
    a = x_ref[:].reshape(32, 320, 2)
    o_ref[:] = jnp.max(a, axis=2)
probe("lane-split-reshape", k7, x_shape=(32, 640), out_shape=(32, 320))

# 8: pixel-sublane 2d: slice rows with arbitrary offset then dot
def k8(x_ref, o_ref):
    a = x_ref[645:645 + 20608, :]
    w = jnp.ones((64, 64), jnp.float32)
    o_ref[:] = jnp.dot(a, w, preferred_element_type=jnp.float32)
probe("rowshift-2d-dot", k8, x_shape=(22540, 64), out_shape=(20608, 64))

# 9: reshape [34,644,64]->[34*644,64] (merge leading dims, 3d->2d)
def k9(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(34 * 644, 64)
probe("major-merge-3d-2d", k9, x_shape=(34, 644, 64), out_shape=(34 * 644, 64))
