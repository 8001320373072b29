"""Quadratic rate control (reference capability F18).

Faithful re-expression of the JM quadratic R-Q model used by the reference
(``FR/src/ratectl.c``: rc_init_seq :50, rc_init_pict :296,
updateQuantizationParameter :669, RCModelEstimator :1579, QP2Qstep :1799):

  R(Q) = X1 * MAD / Q  +  X2 * MAD / Q^2

X1/X2 are re-estimated each frame by least squares over a sliding window of
(R, Q, MAD) observations; MAD of the upcoming frame is predicted by a linear
model over the previous frame's MAD.  Per-frame QP moves at most +-2 (JM's
DDquant) and stays in [1, 51].
"""

from __future__ import annotations

import numpy as np

_QSTEP0 = np.array([0.625, 0.6875, 0.8125, 0.875, 1.0, 1.125])


def qp2qstep(qp: int) -> float:
    return float(_QSTEP0[qp % 6] * (1 << (qp // 6)))


def qstep2qp(qstep: float) -> int:
    if qstep < qp2qstep(0):
        return 0
    if qstep > qp2qstep(51):
        return 51
    q = 0
    while qp2qstep(q + 1) <= qstep and q < 51:
        q += 1
    return q


class QuadraticRateControl:
    def __init__(self, target_bps: float, frame_rate: float, qp_init: int,
                 window: int = 20):
        self.bits_per_frame = target_bps / frame_rate
        self.window = window
        self.obs: list = []           # (bits, qstep, mad)
        self.mads: list = []
        self.prev_qp = qp_init
        self.x1 = self.bits_per_frame * qp2qstep(qp_init)
        self.x2 = 0.0
        self.a1, self.a2 = 1.0, 0.0
        self.bits_balance = 0.0       # virtual buffer (spent - budget)

    # -- model estimation (RCModelEstimator / MADModelEstimator) ----------
    def _fit_rq(self):
        if len(self.obs) < 2:
            return
        obs = self.obs[-self.window:]
        A = np.array([[m / q, m / (q * q)] for (_, q, m) in obs])
        b = np.array([r for (r, _, _) in obs])
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        if np.isfinite(sol).all() and sol[0] > 0:
            self.x1, self.x2 = float(sol[0]), float(sol[1])

    def _fit_mad(self):
        if len(self.mads) < 3:
            return
        m = np.array(self.mads[-self.window:])
        A = np.stack([m[:-1], np.ones_like(m[:-1])], axis=1)
        sol, *_ = np.linalg.lstsq(A, m[1:], rcond=None)
        if np.isfinite(sol).all():
            self.a1, self.a2 = float(sol[0]), float(sol[1])

    def predicted_mad(self) -> float:
        if not self.mads:
            return 1.0
        return max(0.1, self.a1 * self.mads[-1] + self.a2)

    # -- per-frame API ------------------------------------------------------
    def frame_qp(self) -> int:
        """QP for the next P frame from the quadratic model."""
        # target: per-frame budget minus a fraction of the buffer imbalance
        t = max(self.bits_per_frame - 0.5 * self.bits_balance / max(len(self.obs), 1),
                self.bits_per_frame * 0.1)
        mad = self.predicted_mad()
        # solve X1*mad/Q + X2*mad/Q^2 = t  for Qstep
        c1, c2 = self.x1 * mad, self.x2 * mad
        if abs(c2) < 1e-9:
            qstep = c1 / t
        else:
            disc = c1 * c1 + 4 * c2 * t
            qstep = 2 * c2 / (np.sqrt(max(disc, 0.0)) - c1) if disc > 0 else c1 / t
            if qstep <= 0:
                qstep = c1 / t
        qp = qstep2qp(abs(qstep))
        qp = int(np.clip(qp, self.prev_qp - 2, self.prev_qp + 2))
        return int(np.clip(qp, 1, 51))

    def update(self, bits_used: int, qp_used: int, mad: float):
        self.obs.append((float(bits_used), qp2qstep(qp_used), max(mad, 0.1)))
        self.mads.append(max(mad, 0.1))
        self.bits_balance += bits_used - self.bits_per_frame
        self.prev_qp = qp_used
        self._fit_rq()
        self._fit_mad()
