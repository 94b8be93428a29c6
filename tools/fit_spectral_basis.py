"""Fit an exact-round-trip RGB->spectral upsampling basis.

Mallett & Yuksel 2019 ("Spectral Primary Decomposition for Rendering with
sRGB Reflectance") style: three basis spectra B_r, B_g, B_b over the visible
range with

  (1) exactness:  resolving B_i through the renderer's OWN pipeline
      (core/spectrum.spectral_to_rgb: Wyman-fit CMFs + per-channel
      white calibration, BT.709 XYZ->RGB) returns exactly e_i, so ANY
      in-gamut reflectance round-trips exactly in expectation
      (the Smits basis it replaces had ~10% error on saturated colors);
  (2) physicality: B_i(lam) >= 0 and sum_i B_i(lam) == 1 exactly (a
      partition of unity), so every RGB in [0,1]^3 maps to a reflectance
      in [0,1] (energy conserving) and WHITE maps to the flat spectrum;
  (3) smoothness:  minimal second-difference energy subject to (1)+(2)
      (natural reflectances are smooth; smoothness also minimizes
      hero-wavelength variance).

The resolve must be calibrated so the flat spectrum returns exactly white
(core/spectrum._CMF_WHITE_CALIB) — then the partition-of-unity constraint is
consistent with the nine exactness constraints and the QP is feasible.
Solved by a nullspace parameterization of ALL equalities (sum + exactness)
plus an increasing penalty for negativity. Deterministic, ~2 s. Prints the
table to paste into core/spectrum.py (_BASIS_TABLE).
"""
import numpy as np

LAM_MIN, LAM_MAX = 380.0, 720.0
N = 64                      # table resolution (runtime: nearest-bin lookup)
DENSE = 2048                # integration grid


def cmf_gauss(x, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    return np.exp(-0.5 * ((x - mu) / s) ** 2)


def cie_xyz_cmf(lam):
    x = (1.056 * cmf_gauss(lam, 599.8, 37.9, 31.0)
         + 0.362 * cmf_gauss(lam, 442.0, 16.0, 26.7)
         - 0.065 * cmf_gauss(lam, 501.1, 20.4, 26.2))
    y = (0.821 * cmf_gauss(lam, 568.8, 46.9, 40.5)
         + 0.286 * cmf_gauss(lam, 530.9, 16.3, 31.1))
    z = (1.217 * cmf_gauss(lam, 437.0, 11.8, 36.0)
         + 0.681 * cmf_gauss(lam, 459.0, 26.0, 13.8))
    return np.stack([x, y, z], axis=-1)


RGB2XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227]])


def main():
    lam = np.linspace(LAM_MIN, LAM_MAX, DENSE, endpoint=False) \
        + 0.5 * (LAM_MAX - LAM_MIN) / DENSE
    cmf = cie_xyz_cmf(lam)                              # (DENSE, 3)
    span = LAM_MAX - LAM_MIN
    bin_of = np.minimum(((lam - LAM_MIN) / span * N).astype(int), N - 1)
    # raw integration matrix A[j, k] = integral over bin k of cmf_j
    A = np.zeros((3, N))
    wdl = span / DENSE
    for j in range(3):
        np.add.at(A[j], bin_of, cmf[:, j] * wdl)
    # white calibration: flat spectrum -> XYZ of RGB white, exactly
    white_xyz = RGB2XYZ @ np.ones(3)
    calib = white_xyz / (A @ np.ones(N))                # _CMF_WHITE_CALIB
    print("# _CMF_WHITE_CALIB =", tuple(round(c, 8) for c in calib))
    # exactness: calib * (A @ B_i) = RGB2XYZ[:, i]
    T = RGB2XYZ / calib[:, None]                        # (3, 3): A@B_i = T[:,i]

    # unknown x = [B_r; B_g; B_b] (3N). Equalities:
    #   blockdiag(A) x = vec(T)          (9 rows)
    #   [I I I] x = 1                    (N rows, partition of unity)
    E = np.zeros((9 + N, 3 * N))
    rhs = np.zeros(9 + N)
    for i in range(3):
        E[3 * i:3 * i + 3, i * N:(i + 1) * N] = A
        rhs[3 * i:3 * i + 3] = T[:, i]
    for k in range(N):
        E[9 + k, [k, N + k, 2 * N + k]] = 1.0
        rhs[9 + k] = 1.0

    # smoothness objective per basis
    D = np.zeros((N - 2, N))
    for k in range(N - 2):
        D[k, k:k + 3] = (1.0, -2.0, 1.0)
    H1 = D.T @ D
    H = np.kron(np.eye(3), H1) + 1e-10 * np.eye(3 * N)

    # exact equality via nullspace; penalty for negativity only
    x0, *_ = np.linalg.lstsq(E, rhs, rcond=None)
    _, s, Vt = np.linalg.svd(E)
    Z = Vt[(s > 1e-10 * s[0]).sum():].T                 # (3N, free)
    x = x0.copy()
    Hn = np.abs(H).sum()
    for it in range(6000):
        pen = 50.0 * (1.0 + it)
        G = H @ x + pen * np.minimum(x, 0.0)
        x = x - Z @ (Z.T @ G) / (Hn + pen)
    # polish: clip negatives, renormalize the sum, restore ALL equalities
    for _ in range(300):
        xc = np.clip(x, 0.0, None).reshape(3, N)
        xc = (xc / np.maximum(xc.sum(0, keepdims=True), 1e-12)).reshape(-1)
        x = xc - E.T @ np.linalg.solve(E @ E.T + 1e-12 * np.eye(9 + N),
                                       E @ xc - rhs)

    B = x.reshape(3, N).T                               # (N, 3)
    res = np.abs(E @ x - rhs).max()
    print(f"# equality residual {res:.2e}, min {B.min():.6f}, "
          f"sum range [{B.sum(1).min():.6f}, {B.sum(1).max():.6f}]")
    # verify round-trip on random colors through the runtime math
    rng = np.random.default_rng(0)
    rgb = rng.random((256, 3))
    refl = (B[bin_of] @ rgb.T).T                        # (256, DENSE)
    xyz = (refl[..., None] * cmf[None]).sum(1) * wdl * calib
    out = (np.linalg.inv(RGB2XYZ) @ xyz.T).T
    print(f"# round-trip max err over random colors: "
          f"{np.abs(out - rgb).max():.2e}")
    print("_BASIS_TABLE = [  # (N, 3) fitted by tools/fit_spectral_basis.py")
    for k in range(N):
        print(f"    ({B[k,0]:.6f}, {B[k,1]:.6f}, {B[k,2]:.6f}),")
    print("]")


if __name__ == "__main__":
    main()
