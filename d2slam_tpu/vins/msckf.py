"""MSCKF: Multi-State-Constraint Kalman Filter, fully jit-compiled.

TPU-native counterpart of the reference's experimental MSCKF
(reference: d2vins/src/MSCKF/ — error-state propagation MSCKF.cpp:19-100
and camera-state augmentation; the reference never wires it into the
node and has no measurement update). This implementation is complete:
IMU error-state propagation, fixed-size FIFO camera-clone augmentation,
and the landmark update with left-nullspace projection of the feature
Jacobian, Mahalanobis gating, and a Joseph-form EKF update — all static
shapes (clone count C and landmark batch L fixed, masked), so the whole
filter is one XLA program per step.

Error-state layout (15 + 6C):
    [dtheta(3), dp(3), dv(3), dbg(3), dba(3), (dtheta_c, dp_c) x C]
Rotation errors are right-perturbations: q <- q (x) exp(dtheta/2).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from d2slam_tpu.geometry.lie import (
    quat_from_small_angle,
    quat_identity,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_rotmat,
    skew,
    so3_exp_quat,
)

GRAVITY = jnp.array([0.0, 0.0, -9.805])


@dataclasses.dataclass(frozen=True)
class MSCKFConfig:
    num_clones: int = 10          # C: sliding camera states
    max_landmarks: int = 32       # L: landmark tracks per update batch
    gyr_n: float = 2.5e-3
    acc_n: float = 2.6e-2
    gyr_w: float = 2.7e-5
    acc_w: float = 2.0e-4
    pix_sigma: float = 1.5e-3     # noise on normalized image coords
    chi2_per_dof: float = 7.0     # Mahalanobis gate
    init_att_sigma: float = 1e-3
    init_pos_sigma: float = 1e-6
    init_vel_sigma: float = 1e-2
    init_bg_sigma: float = 1e-3
    init_ba_sigma: float = 1e-2


class MSCKFState(NamedTuple):
    q: jax.Array            # [4] world<-body (xyzw)
    p: jax.Array            # [3]
    v: jax.Array            # [3]
    bg: jax.Array           # [3]
    ba: jax.Array           # [3]
    clone_q: jax.Array      # [C, 4]
    clone_p: jax.Array      # [C, 3]
    clone_valid: jax.Array  # [C] bool
    clone_stamp: jax.Array  # [C] float (for debugging / association)
    next_slot: jax.Array    # [] int32 FIFO insertion cursor
    P: jax.Array            # [15+6C, 15+6C]


def msckf_init(cfg: MSCKFConfig, q0=None, p0=None, v0=None,
               dtype=jnp.float64) -> MSCKFState:
    C = cfg.num_clones
    D = 15 + 6 * C
    diag = jnp.concatenate([
        jnp.full(3, cfg.init_att_sigma**2),
        jnp.full(3, cfg.init_pos_sigma**2),
        jnp.full(3, cfg.init_vel_sigma**2),
        jnp.full(3, cfg.init_bg_sigma**2),
        jnp.full(3, cfg.init_ba_sigma**2),
        jnp.zeros(6 * C),
    ]).astype(dtype)
    return MSCKFState(
        q=(quat_identity(dtype) if q0 is None else jnp.asarray(q0, dtype)),
        p=(jnp.zeros(3, dtype) if p0 is None else jnp.asarray(p0, dtype)),
        v=(jnp.zeros(3, dtype) if v0 is None else jnp.asarray(v0, dtype)),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        clone_q=jnp.tile(quat_identity(dtype), (C, 1)),
        clone_p=jnp.zeros((C, 3), dtype),
        clone_valid=jnp.zeros(C, bool),
        clone_stamp=jnp.zeros(C, dtype),
        next_slot=jnp.asarray(0, jnp.int32),
        P=jnp.diag(diag),
    )


# ---------------------------------------------------------------------------
# propagation
# ---------------------------------------------------------------------------


def msckf_propagate(state: MSCKFState, cfg: MSCKFConfig,
                    dts, gyrs, accs, mask=None,
                    gravity=GRAVITY) -> MSCKFState:
    """Propagate through a (padded) window of IMU samples with a scan.

    dts [N], gyrs [N, 3], accs [N, 3], mask [N] (False = padding).
    """
    dtype = state.P.dtype
    C = cfg.num_clones
    if mask is None:
        mask = jnp.ones(dts.shape[0], bool)

    def step(carry, inp):
        q, p, v, bg, ba, P = carry
        dt, w_m, a_m, m = inp
        dt = jnp.where(m, dt, 0.0).astype(dtype)
        w = w_m.astype(dtype) - bg
        a = a_m.astype(dtype) - ba
        R = quat_to_rotmat(q)

        # nominal midpoint-free Euler step (dt ~ 2.5 ms at 400 Hz)
        q_new = quat_normalize(quat_mul(q, so3_exp_quat(w * dt)))
        acc_w = R @ a + gravity.astype(dtype)
        p_new = p + v * dt + 0.5 * acc_w * dt * dt
        v_new = v + acc_w * dt

        # error-state transition for [dth, dp, dv, dbg, dba]
        I3 = jnp.eye(3, dtype=dtype)
        F = jnp.eye(15, dtype=dtype)
        F = F.at[0:3, 0:3].set(I3 - skew(w) * dt)
        F = F.at[0:3, 9:12].set(-I3 * dt)
        F = F.at[3:6, 6:9].set(I3 * dt)
        F = F.at[6:9, 0:3].set(-(R @ skew(a)) * dt)
        F = F.at[6:9, 12:15].set(-R * dt)

        Qd = jnp.zeros((15, 15), dtype)
        Qd = Qd.at[0:3, 0:3].set(I3 * cfg.gyr_n**2 * dt)
        Qd = Qd.at[6:9, 6:9].set(I3 * cfg.acc_n**2 * dt)
        Qd = Qd.at[9:12, 9:12].set(I3 * cfg.gyr_w**2 * dt)
        Qd = Qd.at[12:15, 12:15].set(I3 * cfg.acc_w**2 * dt)

        Pss = P[:15, :15]
        Psc = P[:15, 15:]
        P_new = P.at[:15, :15].set(F @ Pss @ F.T + Qd)
        P_new = P_new.at[:15, 15:].set(F @ Psc)
        P_new = P_new.at[15:, :15].set((F @ Psc).T)
        P_new = 0.5 * (P_new + P_new.T)
        return (q_new, p_new, v_new, bg, ba, P_new), None

    carry = (state.q, state.p, state.v, state.bg, state.ba, state.P)
    (q, p, v, bg, ba, P), _ = jax.lax.scan(
        step, carry, (dts, gyrs, accs, mask)
    )
    return state._replace(q=q, p=p, v=v, bg=bg, ba=ba, P=P)


# ---------------------------------------------------------------------------
# clone augmentation
# ---------------------------------------------------------------------------


def msckf_augment(state: MSCKFState, cfg: MSCKFConfig,
                  stamp=0.0) -> Tuple[MSCKFState, jax.Array]:
    """Clone the current body pose into the FIFO slot. Returns
    (new_state, slot_index). The clone error is [dth_c, dp_c] =
    [dth, dp], so the augmentation Jacobian rows are identity blocks."""
    C = cfg.num_clones
    slot = state.next_slot % C
    cq = state.clone_q.at[slot].set(state.q)
    cp = state.clone_p.at[slot].set(state.p)
    cv = state.clone_valid.at[slot].set(True)
    cs = state.clone_stamp.at[slot].set(jnp.asarray(stamp, state.P.dtype))

    D = 15 + 6 * C
    # J: [6, D] picking (dth, dp) of the body state
    J = jnp.zeros((6, D), state.P.dtype)
    J = J.at[0:3, 0:3].set(jnp.eye(3, dtype=state.P.dtype))
    J = J.at[3:6, 3:6].set(jnp.eye(3, dtype=state.P.dtype))
    new_rows = J @ state.P            # [6, D]
    new_corner = new_rows @ J.T       # [6, 6]
    base = (15 + 6 * slot).astype(jnp.int32)
    zero = jnp.asarray(0, jnp.int32)
    P = jax.lax.dynamic_update_slice(state.P, new_rows, (base, zero))
    P = jax.lax.dynamic_update_slice(P, new_rows.T, (zero, base))
    P = jax.lax.dynamic_update_slice(P, new_corner, (base, base))
    return state._replace(clone_q=cq, clone_p=cp, clone_valid=cv,
                          clone_stamp=cs, next_slot=state.next_slot + 1,
                          P=P), slot


# ---------------------------------------------------------------------------
# landmark triangulation + update
# ---------------------------------------------------------------------------


def _triangulate_dlt(rays_w, centers, w):
    """Weighted linear triangulation: point minimizing distance to the
    world-frame rays (I - d d^T) (pf - c) = 0. rays_w [C,3] unit,
    centers [C,3], w [C] weights."""
    I = jnp.eye(3, dtype=rays_w.dtype)
    A = w[:, None, None] * (I - rays_w[:, :, None] * rays_w[:, None, :])
    AtA = jnp.sum(A, axis=0)
    Atb = jnp.sum(jnp.einsum("cij,cj->ci", A, centers), axis=0)
    return jnp.linalg.solve(AtA + 1e-9 * I, Atb)


def msckf_update(state: MSCKFState, cfg: MSCKFConfig,
                 obs_uv, obs_mask, T_cam_body=None) -> MSCKFState:
    """Batched landmark update.

    obs_uv  [L, C, 2]: normalized image coords (x/z, y/z) of landmark l
            observed from clone c; obs_mask [L, C] validity.
    T_cam_body: optional [7] body->camera extrinsic ([p, q]); identity
            (camera = body, z forward) when None.
    """
    dtype = state.P.dtype
    C = cfg.num_clones
    L = obs_uv.shape[0]
    D = 15 + 6 * C
    obs_mask = obs_mask & state.clone_valid[None, :]

    if T_cam_body is None:
        q_cb = quat_identity(dtype)
        p_cb = jnp.zeros(3, dtype)
    else:
        p_cb, q_cb = T_cam_body[:3], T_cam_body[3:]
    R_cb = quat_to_rotmat(q_cb)

    # camera poses for each clone: R_wc = R_wb R_bc, p_wc = p_wb + R_wb p_bc
    R_wb = quat_to_rotmat(state.clone_q)                   # [C, 3, 3]
    R_bc = R_cb.T
    p_bc = -R_bc @ p_cb
    R_wc = jnp.einsum("cij,jk->cik", R_wb, R_bc)
    p_wc = state.clone_p + jnp.einsum("cij,j->ci", R_wb, p_bc)

    def per_landmark(uv, m):
        wgt = m.astype(dtype)
        # back-projected world rays from measurements
        rays_c = jnp.concatenate(
            [uv.astype(dtype), jnp.ones((C, 1), dtype)], axis=-1)
        rays_c = rays_c / jnp.linalg.norm(rays_c, axis=-1, keepdims=True)
        rays_w = jnp.einsum("cij,cj->ci", R_wc, rays_c)
        pf = _triangulate_dlt(rays_w, p_wc, wgt)

        # residuals + jacobians per clone
        pf_c = jnp.einsum("cji,cj->ci", R_wc, pf - p_wc)   # [C, 3] cam frame
        z_hat = pf_c[:, :2] / jnp.maximum(pf_c[:, 2:3], 1e-6)
        r = (uv.astype(dtype) - z_hat)                     # [C, 2]
        depth_ok = pf_c[:, 2] > 0.05
        wrow = (m & depth_ok).astype(dtype)

        z = jnp.maximum(pf_c[:, 2], 1e-6)
        Jproj = jnp.stack([
            jnp.stack([1.0 / z, jnp.zeros_like(z), -pf_c[:, 0] / z**2], -1),
            jnp.stack([jnp.zeros_like(z), 1.0 / z, -pf_c[:, 1] / z**2], -1),
        ], axis=1)                                          # [C, 2, 3]
        R_cw = jnp.swapaxes(R_wc, 1, 2)
        # d pf_c / d pf = R_cw ; d pf_c / d dp_clone = -R_cw
        Hf_c = jnp.einsum("cij,cjk->cik", Jproj, R_cw)      # [C, 2, 3]
        Hp_c = -Hf_c
        # d pf_c / d dth_clone (right perturbation of q_wb):
        #   pf_c = R_bc^T R_wb^T (pf - p_wb) ; with R_wb <- R_wb Exp(dth)
        #   => d pf_c / d dth = R_bc^T skew(R_wb^T (pf - p_wb))
        pf_b = jnp.einsum("cji,cj->ci", R_wb, pf - state.clone_p)  # body frame
        dth_blk = jnp.einsum("ij,cjk->cik", R_bc.T,
                             jax.vmap(skew)(pf_b))          # [C, 3, 3]
        Hth_c = jnp.einsum("cij,cjk->cik", Jproj, dth_blk)  # [C, 2, 3]

        # stack rows into H_x [2C, D] via one-hot block placement
        base = 15 + 6 * jnp.arange(C)
        onehot_th = jax.nn.one_hot(base[:, None] + jnp.arange(3)[None],
                                   D, dtype=dtype)          # [C, 3, D]
        onehot_p = jax.nn.one_hot(base[:, None] + 3 + jnp.arange(3)[None],
                                  D, dtype=dtype)
        Hx = (jnp.einsum("cik,ckD->ciD", Hth_c, onehot_th)
              + jnp.einsum("cik,ckD->ciD", Hp_c, onehot_p))  # [C, 2, D]
        Hx = (Hx * wrow[:, None, None]).reshape(2 * C, D)
        Hf = (Hf_c * wrow[:, None, None]).reshape(2 * C, 3)
        rvec = (r * wrow[:, None]).reshape(2 * C)

        # left-nullspace projection of Hf: Q2^T Hx, Q2^T r
        Qm, _ = jnp.linalg.qr(Hf, mode="complete")          # [2C, 2C]
        N = Qm[:, 3:]                                       # [2C, 2C-3]
        H0 = N.T @ Hx                                       # [2C-3, D]
        r0 = N.T @ rvec
        nvalid = jnp.sum(wrow)
        return H0, r0, nvalid

    H0, r0, nvalid = jax.vmap(per_landmark)(obs_uv, obs_mask)
    rows = 2 * C - 3

    # Mahalanobis gate per landmark: r0^T (H0 P H0^T + s I)^-1 r0
    sig2 = jnp.asarray(cfg.pix_sigma**2, dtype)
    PHt = jnp.einsum("ij,lrj->lir", state.P, H0)            # [L, D, rows]
    S = jnp.einsum("lrj,ljs->lrs", H0, PHt) + sig2 * jnp.eye(rows, dtype=dtype)
    gamma = jnp.einsum("lr,lrs,ls->l", r0, jnp.linalg.inv(S), r0)
    dof = jnp.maximum(2 * nvalid - 3, 1.0)
    keep = (gamma < cfg.chi2_per_dof * dof) & (nvalid >= 2)

    wl = keep.astype(dtype)
    Hbig = (H0 * wl[:, None, None]).reshape(L * rows, D)
    rbig = (r0 * wl[:, None]).reshape(L * rows)

    # EKF update (Joseph form)
    S_big = Hbig @ state.P @ Hbig.T + sig2 * jnp.eye(L * rows, dtype=dtype)
    K = jnp.linalg.solve(S_big, Hbig @ state.P).T           # [D, L*rows]
    dx = K @ rbig
    IKH = jnp.eye(D, dtype=dtype) - K @ Hbig
    P = IKH @ state.P @ IKH.T + sig2 * (K @ K.T)
    P = 0.5 * (P + P.T)

    return _inject(state, cfg, dx)._replace(P=P)


def _inject(state: MSCKFState, cfg: MSCKFConfig, dx) -> MSCKFState:
    C = cfg.num_clones
    q = quat_normalize(quat_mul(state.q, quat_from_small_angle(dx[0:3])))
    p = state.p + dx[3:6]
    v = state.v + dx[6:9]
    bg = state.bg + dx[9:12]
    ba = state.ba + dx[12:15]
    dclone = dx[15:].reshape(C, 6)
    cq = quat_normalize(
        quat_mul(state.clone_q, jax.vmap(quat_from_small_angle)(dclone[:, :3]))
    )
    cp = state.clone_p + dclone[:, 3:]
    return state._replace(q=q, p=p, v=v, bg=bg, ba=ba,
                          clone_q=cq, clone_p=cp)
