"""CTC prefix scoring (host/numpy reference implementation).

Reference parity: SURVEY.md section 2a "CTC prefix scorer" — the numpy
CTCPrefixScore used by the reference's joint CTC/attention one-pass beam
search (Watanabe et al. hybrid decoding). This host version exists as the
slow oracle for equivalence tests of the batched on-device search in
decode/beam.py (SURVEY.md section 7 step 5: "keep a slow host-side reference
implementation for equivalence tests").

Formulation: for a prefix g and candidate extension c, the prefix
probability splits into non-blank/blank forward variables
  r^n_t(h): prob of emitting h with a path ending in c (non-blank) at t
  r^b_t(h): prob of emitting h with a path ending in blank at t
with
  phi_t = r^b_t(g) + [c == last(g) ? nothing : r^n_t(g)]   (log domain)
  r^n_t(h) = x_t[c]     + logaddexp(r^n_{t-1}(h), phi_{t-1})
  r^b_t(h) = x_t[blank] + logaddexp(r^n_{t-1}(h), r^b_{t-1}(h))
  psi(h)   = logsumexp_t (phi_{t-1} + x_t[c])              (prefix score)
and psi(g + eos) = logaddexp(r^n_T(g), r^b_T(g)) (full sequence prob).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

LOG_ZERO = -1e10


class CTCPrefixScore:
    """Per-utterance prefix scorer over log-probs x (T, V)."""

    def __init__(self, x: np.ndarray, blank: int, eos: int):
        self.x = np.asarray(x, dtype=np.float64)
        self.T, self.V = self.x.shape
        self.blank = blank
        self.eos = eos

    def initial_state(self) -> np.ndarray:
        """r for the empty prefix: (T, 2) with [:, 0]=r^n, [:, 1]=r^b."""
        r = np.full((self.T, 2), LOG_ZERO, dtype=np.float64)
        r[0, 1] = self.x[0, self.blank]
        for t in range(1, self.T):
            r[t, 1] = r[t - 1, 1] + self.x[t, self.blank]
        return r

    def __call__(
        self, y: list, r_prev: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Score all V extensions of prefix y (y[0] is <sos>, not emitted).

        Returns (psi (V,), r (T, 2, V)) where r[:, :, c] is the forward state
        for prefix y + [c].
        """
        output_length = len(y) - 1
        last = y[-1]
        xs = self.x  # (T, V)

        r_sum = np.logaddexp(r_prev[:, 0], r_prev[:, 1])  # (T,)
        log_phi = np.tile(r_sum[:, None], (1, self.V))
        if output_length > 0:
            log_phi[:, last] = r_prev[:, 1]

        # phi shifted by one frame; phi[-1] = 0 (prob 1) iff prefix empty.
        phi_init = 0.0 if output_length == 0 else LOG_ZERO
        phi_prev = np.concatenate([[np.full(self.V, phi_init)], log_phi[:-1]])

        r = np.full((self.T, 2, self.V), LOG_ZERO, dtype=np.float64)
        psi = np.full(self.V, LOG_ZERO, dtype=np.float64)
        rn_p = np.full(self.V, LOG_ZERO)
        rb_p = np.full(self.V, LOG_ZERO)
        for t in range(self.T):
            rn = xs[t][np.arange(self.V)] + np.logaddexp(rn_p, phi_prev[t])
            rb = xs[t, self.blank] + np.logaddexp(rn_p, rb_p)
            psi = np.logaddexp(psi, phi_prev[t] + xs[t])
            r[t, 0], r[t, 1] = rn, rb
            rn_p, rb_p = rn, rb

        psi[self.eos] = r_sum[-1]
        psi[self.blank] = LOG_ZERO
        return psi, r
