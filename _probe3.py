import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import time

def kern(x_ref, w_ref, o_ref):
    taps = [x_ref[k] for k in range(9)]
    X9 = jnp.stack(taps, axis=0)          # [9, H1, W1]
    o_ref[:] = jax.lax.dot_general(
        X9, w_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

H1, W1 = 19, 656
x = jnp.asarray(np.random.default_rng(0).normal(size=(9, H1, W1)), jnp.float32)
w = jnp.asarray(np.random.default_rng(1).normal(size=(9, 64)), jnp.float32)
try:
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H1, W1, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)
    ref = np.einsum("khw,kc->hwc", np.asarray(x), np.asarray(w))
    print("RESULT major-contract-dot OK err", np.abs(np.asarray(out)-ref).max())
except Exception as e:
    print("RESULT major-contract-dot FAIL:", str(e).split("\n")[0][:100])
