"""Regenerate the tanh-polynomial GELU coefficients in ops/activations.py.

Fits erf(x / sqrt(2)) ~ tanh(c1 x + c3 x^3 + ... + c13 x^13) by Lawson-
iterated reweighted least squares on atanh(erf), minimax in OUTPUT space.
XLA's erf is a slow VPU software polynomial (5.6 ms of a 23.9 ms flagship
extraction step); tanh takes the fast transcendental path, so gelu built
on tanh costs the same as relu. Achieved max |err| on erf: ~1.3e-7 in
float32 evaluation (at f32 rounding), so gelu parity vs the exact form is
<= ~5e-7 absolute — far inside the 1e-4 north-star budget.
"""

import numpy as np
from scipy.special import erf

ORDER = 7  # number of odd-power terms -> highest power x^13


def fit():
    u = np.linspace(1e-6, 6.0, 120001)  # u = x / sqrt(2)
    t = np.clip(erf(u), None, 1 - 1e-18)
    y = np.arctanh(t)
    powers = [2 * i + 1 for i in range(ORDER)]
    A = np.stack([u ** p for p in powers], 1)
    w = 1.0 / np.cosh(y) ** 2
    weight = w.copy()
    best = None
    for _ in range(60):
        c, *_ = np.linalg.lstsq(A * weight[:, None], y * weight, rcond=None)
        err = np.abs(np.tanh(A @ c) - t)
        m = err.max()
        if best is None or m < best[0]:
            best = (m, c.copy())
        weight = weight * (1.0 + err / (m + 1e-30)) ** 0.5
        weight /= weight.max()
    m, c = best
    # fold u = x / sqrt(2): coefficient for x^(2i+1) is c_i / sqrt(2)^(2i+1)
    folded = [ci / np.sqrt(2.0) ** p for ci, p in zip(c, powers)]

    # validate in f32 arithmetic over a wide range
    x = np.linspace(0, 40, 4000001).astype(np.float32)
    x2 = x * x
    q = np.float32(folded[-1])
    for ci in folded[-2::-1]:
        q = q * x2 + np.float32(ci)
    q = q * x
    approx = np.tanh(q.astype(np.float64))
    exact = erf(x.astype(np.float64) / np.sqrt(2.0))
    err_erf = np.abs(approx - exact).max()
    gelu_err = np.abs(0.5 * x * (approx - exact)).max()
    print(f"minimax fit err {m:.3e}; f32 eval: erf err {err_erf:.3e}, "
          f"gelu abs err {gelu_err:.3e}")
    print("coefficients (x^1, x^3, ..., x^13):")
    for v in folded:
        print(f"    {v!r},")


if __name__ == "__main__":
    fit()
