import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from d2slam_tpu.ops.superpoint_stem_pallas import stem_reference, TH

rng = np.random.default_rng(0)
H, W = 64, 128
img = rng.uniform(0, 1, (1, H, W)).astype(np.float32)
p1w = rng.normal(0, .3, (3,3,1,64)).astype(np.float32)
p1b = rng.normal(0, .1, (64,)).astype(np.float32)
p2w = rng.normal(0, .08, (3,3,64,64)).astype(np.float32)
p2b = rng.normal(0, .1, (64,)).astype(np.float32)

# numpy emulation of the kernel (f32, no bf16 — compare against f32 conv ref)
W1, Wp = W + 16, W + 18
base = np.zeros((1, H + 8, W + 20), np.float32)
base[:, 2:2+H, 3:3+W] = img
xp3 = np.stack([base[:, :, dx:dx+Wp] for dx in range(3)], axis=1)

H1 = TH + 3
P1, P2 = H1 * W1, TH * W1
w1 = p1w.reshape(9, 64)
w2 = p2w.reshape(9, 64, 64)

out = np.zeros((1, H//2, W1, 64), np.float32)
for t in range(H // TH):
    r0 = t * TH
    planes = [xp3[0, dx, :, :W1] for dx in range(3)]
    taps = [planes[dx][r0+dy : r0+dy+H1, :] for dy in range(3) for dx in range(3)]
    xcol = np.stack(taps, axis=2)  # [H1, W1, 9]
    a1 = xcol.reshape(P1, 9) @ w1
    out1 = np.maximum(a1 + p1b, 0)
    acc2 = np.zeros((P2, 64), np.float32)
    for dy in range(3):
        for dx in range(3):
            off = dy * W1 + dx
            acc2 += out1[off:off+P2] @ w2[dy*3+dx]
    out2 = np.maximum(acc2 + p2b, 0)
    x3 = out2.reshape(TH//2, 2, W1, 64)
    rp = x3.max(1)
    rolled = np.roll(rp, -(1), axis=1)  # rp[j+1]
    m = np.maximum(rp, rolled)
    out[0, t*(TH//2):(t+1)*(TH//2)] = m
dec = out[:, :, 1:1+W:2, :]

# f32 reference conv
def ref_f32(img):
    x = jnp.asarray(img)[..., None]
    def conv(x, w, b):
        return jax.lax.conv_general_dilated(x, jnp.asarray(w), (1,1), "SAME",
            dimension_numbers=("NHWC","HWIO","NHWC")) + b
    x = jax.nn.relu(conv(x, p1w, p1b))
    x = jax.nn.relu(conv(x, p2w, p2b))
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1,2,2,1),(1,2,2,1),"VALID")
b = np.asarray(ref_f32(img))
err = np.abs(dec - b)
print("RESULT np-emu max err", err.max(), "bad frac", (err > 1e-3).mean())
bad = (err > 1e-3).any(-1)[0]
ys, xs = np.where(bad)
if len(ys):
    print("RESULT bad rows", np.unique(ys)[:12], "cols", np.unique(xs)[:12])

# --- stage check: conv1a for tile t=1 -----------------------------------
t = 1; r0 = t * TH
planes = [xp3[0, dx, :, :W1] for dx in range(3)]
taps = [planes[dx][r0+dy : r0+dy+H1, :] for dy in range(3) for dx in range(3)]
xcol = np.stack(taps, axis=2)
out1 = np.maximum(xcol.reshape(P1, 9) @ w1 + p1b, 0).reshape(H1, W1, 64)
# reference conv1: out1[i, j] should equal relu(conv1a)(orig row r0-1+i, col j-2)
x = jnp.asarray(img)[..., None]
c1 = jax.nn.relu(jax.lax.conv_general_dilated(x, jnp.asarray(p1w), (1,1), "SAME",
      dimension_numbers=("NHWC","HWIO","NHWC")) + p1b)
c1 = np.asarray(c1)[0]  # [H, W, 64]
errs = []
for i in range(H1):
    R = r0 - 1 + i
    if R < 0 or R >= H: continue
    for j in range(2, W + 2):
        C = j - 2
        e = np.abs(out1[i, j] - c1[R, C]).max()
        errs.append((e, i, j))
errs.sort(reverse=True)
print("RESULT conv1a worst", errs[0], "median", errs[len(errs)//2][0])

# --- stage check: conv1b for tile t=1 -----------------------------------
out1f = out1.reshape(P1, 64)
acc2 = np.zeros((P2, 64), np.float32)
for dy in range(3):
    for dx in range(3):
        off = dy * W1 + dx
        acc2 += out1f[off:off+P2] @ w2[dy*3+dx]
out2 = np.maximum(acc2 + p2b, 0).reshape(TH, W1, 64)
c2 = jax.nn.relu(jax.lax.conv_general_dilated(jnp.asarray(c1)[None], jnp.asarray(p2w), (1,1), "SAME",
      dimension_numbers=("NHWC","HWIO","NHWC")) + p2b)
c2 = np.asarray(c2)[0]
errs = []
for i2 in range(TH):
    R = r0 + i2
    for j2 in range(1, W + 1):
        C = j2 - 1
        e = np.abs(out2[i2, j2] - c2[R, C]).max()
        errs.append((e, i2, j2))
errs.sort(reverse=True)
print("RESULT conv1b worst", errs[0], "median", errs[len(errs)//2][0], "n_bad", sum(1 for e,_,_ in errs if e > 1e-3))
for e, i2, j2 in errs[:6]:
    print("RESULT bad at i2,j2:", i2, j2, "err", e)

print("RESULT out1 at orig col -1 (j=1) maxabs", np.abs(out1[:, 1]).max())
print("RESULT out1 at orig col W (j=W+2) maxabs", np.abs(out1[:, W+2]).max())

e_left = [np.abs(out2[i2, 1] - c2[r0+i2, 0]).max() for i2 in range(TH)]
print("RESULT left-edge errs", np.round(e_left, 6).tolist())
# manual: what does reference c2[R,0] equal vs my out2[i2,1]?
i2 = 4; R = r0 + i2
ref_val = c2[R, 0]
mine = out2[i2, 1]
# contribution of out1 col 1 (orig -1):
contrib = sum(out1[(i2+dy), 1] @ w2[dy*3+0] for dy in range(3))
print("RESULT contrib norm of orig-col--1", np.abs(contrib).max())
