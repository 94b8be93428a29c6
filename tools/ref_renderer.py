"""Independent brute-force CPU reference renderer (the external RMSE anchor).

The reference project validates renders against goldens-by-eye
(`README.md:5`, `docs/images/*`); BASELINE.json asks for "RMSE parity at
equal spp" against a TRUSTED renderer.  No external renderer is available
offline, so this module is a from-scratch, shared-nothing implementation of
the same physics used only as a cross-check:

  - pure numpy (no jax, no framework imports beyond scene-DATA extraction),
  - brute-force all-triangles Moller-Trumbore (no BVH),
  - its own RNG (numpy PCG64), its own warps, its own NEE/MIS arithmetic.

Both renderers are unbiased estimators of the same path-space integral
truncated at the same path length, so their converged images agree in
expectation; tests/test_rmse_anchor.py renders both at equal spp and bounds
the RMSE against the Monte-Carlo noise floor calibrated from two
independent seeds of THIS renderer.

Script mode writes the committed golden:
    python tools/ref_renderer.py cornell  -> tests/goldens/ref_cornell.npz
    python tools/ref_renderer.py veach    -> tests/goldens/ref_veach.npz
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INV_PI = 1.0 / np.pi


# ---------------------------------------------------------------------------
# scene-data extraction (data only: triangles, normals, material constants)
# ---------------------------------------------------------------------------

def extract(sc):
    """Pull world-space triangle soup + per-tri constants out of a host
    DynamicScene (cudatracerlib_tpu.scene.host) BEFORE any device build."""
    v0, v1, v2, n0, n1, n2, refl, emit = [], [], [], [], [], [], [], []
    mtype, alpha, eta_c, k_c = [], [], [], []
    for node in sc._nodes:
        if node is None:
            continue
        m = node.mesh.transformed(node.to_world)
        f = m.f
        t = f.shape[0]
        v0.append(m.v[f[:, 0]]); v1.append(m.v[f[:, 1]]); v2.append(m.v[f[:, 2]])
        n0.append(m.n[f[:, 0]]); n1.append(m.n[f[:, 1]]); n2.append(m.n[f[:, 2]])
        mat = sc._materials[node.material]
        p = mat["params"]
        refl.append(np.tile(p[0:3], (t, 1)))
        mtype.append(np.full(t, mat["mat_type"]))
        alpha.append(np.full(t, p[6]))
        eta_c.append(np.tile(p[8:11], (t, 1)))
        k_c.append(np.tile(p[11:14], (t, 1)))
        e = node.emission if node.emission is not None else (0.0, 0.0, 0.0)
        emit.append(np.tile(np.asarray(e, np.float64), (t, 1)))
    cat = lambda xs: np.concatenate(xs, axis=0)
    tris = dict(v0=cat(v0).astype(np.float64), v1=cat(v1).astype(np.float64),
                v2=cat(v2).astype(np.float64), n0=cat(n0).astype(np.float64),
                n1=cat(n1).astype(np.float64), n2=cat(n2).astype(np.float64),
                refl=cat(refl).astype(np.float64), emit=cat(emit),
                mtype=cat(mtype).astype(np.int32),
                alpha=cat(alpha).astype(np.float64),
                eta_c=cat(eta_c).astype(np.float64),
                k_c=cat(k_c).astype(np.float64))
    e1 = tris["v1"] - tris["v0"]
    e2 = tris["v2"] - tris["v0"]
    ng = np.cross(e1, e2)
    area2 = np.linalg.norm(ng, axis=1)
    tris["ng"] = ng / np.maximum(area2, 1e-20)[:, None]
    tris["area"] = 0.5 * area2
    tris["e1"] = e1
    tris["e2"] = e2
    sen = sc._sensor
    cam = dict(t2w=np.asarray(sen.to_world, np.float64),
               fov_x=float(np.asarray(sen.params)[0]))
    return tris, cam


# ---------------------------------------------------------------------------
# core: brute-force intersection, warps, microfacet math (all independent)
# ---------------------------------------------------------------------------

def intersect(tr, o, d, tmax, chunk=256, any_hit=False):
    """Brute-force closest-hit over ALL triangles.  o,d: (B,3)."""
    B = o.shape[0]
    T = tr["v0"].shape[0]
    best_t = np.full(B, np.inf)
    best_i = np.full(B, -1, np.int64)
    best_u = np.zeros(B)
    best_v = np.zeros(B)
    for s in range(0, B, chunk):
        e = min(s + chunk, B)
        oo = o[s:e, None, :]
        dd = d[s:e, None, :]
        pv = np.cross(dd, tr["e2"][None])
        det = np.einsum("btk,tk->bt", pv, tr["e1"])
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(np.abs(det) < 1e-14, 0.0, 1.0 / det)
        tv = oo - tr["v0"][None]
        u = np.einsum("btk,btk->bt", tv, pv) * inv
        qv = np.cross(tv, tr["e1"][None])
        v = np.einsum("btk,btk->bt", qv, np.broadcast_to(dd, qv.shape)) * inv
        t = np.einsum("btk,tk->bt", qv, tr["e2"]) * inv
        ok = ((np.abs(det) >= 1e-14) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t > 1e-5) & (t < tmax[s:e, None]))
        t = np.where(ok, t, np.inf)
        i = np.argmin(t, axis=1)
        tb = t[np.arange(e - s), i]
        hit = np.isfinite(tb)
        best_t[s:e] = np.where(hit, tb, np.inf)
        best_i[s:e] = np.where(hit, i, -1)
        best_u[s:e] = np.where(hit, u[np.arange(e - s), i], 0.0)
        best_v[s:e] = np.where(hit, v[np.arange(e - s), i], 0.0)
    return best_t, best_i, best_u, best_v


def occluded(tr, o, d, dist, chunk=256):
    t, i, _, _ = intersect(tr, o, d, np.full(o.shape[0], np.inf), chunk)
    return t < dist * 0.999


def make_frame(n):
    """Orthonormal basis about n (Duff et al. branchless)."""
    s = np.where(n[:, 2] >= 0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = np.stack([1.0 + s * n[:, 0] ** 2 * a, s * b, -s * n[:, 0]], axis=1)
    bt = np.stack([b, s + n[:, 1] ** 2 * a, -n[:, 1]], axis=1)
    return t, bt


def cos_sample(n, u1, u2):
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    x = r * np.cos(phi)
    y = r * np.sin(phi)
    z = np.sqrt(np.maximum(1 - u1, 0.0))
    t, bt = make_frame(n)
    return x[:, None] * t + y[:, None] * bt + z[:, None] * n, z * INV_PI


def power_h(p1, p2):
    return np.where(p1 > 0, p1 * p1 / np.maximum(p1 * p1 + p2 * p2, 1e-30), 0.0)


def ggx_d(cos_h, a):
    a2 = a * a
    c2 = cos_h * cos_h
    den = c2 * (a2 - 1.0) + 1.0
    return np.where(cos_h > 0, a2 / np.maximum(np.pi * den * den, 1e-20), 0.0)


def smith_g1(cos_v, a):
    c2 = np.clip(cos_v, 1e-6, 1.0) ** 2
    t2 = (1.0 - c2) / c2
    return 2.0 / (1.0 + np.sqrt(1.0 + a * a * t2))


def fresnel_conductor(cos_i, eta, k):
    """Exact conductor Fresnel (unpolarized average), per channel."""
    c2 = (cos_i ** 2)[:, None]
    s2 = 1.0 - c2
    e2 = eta * eta - k * k - s2
    apb = np.sqrt(np.maximum(e2 * e2 + 4.0 * eta * eta * k * k, 0.0))
    a2 = np.maximum(0.5 * (apb + e2), 0.0)
    a = np.sqrt(a2)
    rs_num = apb + c2 - 2.0 * a * np.sqrt(c2)
    rs_den = apb + c2 + 2.0 * a * np.sqrt(c2)
    rs = rs_num / np.maximum(rs_den, 1e-20)
    rp_num = c2 * apb + s2 * s2 - 2.0 * a * np.sqrt(c2) * s2
    rp_den = c2 * apb + s2 * s2 + 2.0 * a * np.sqrt(c2) * s2
    rp = rs * rp_num / np.maximum(rp_den, 1e-20)
    return 0.5 * (rs + rp)


# ---------------------------------------------------------------------------
# path tracer
# ---------------------------------------------------------------------------

def render(sc, w, h, spp, max_depth=8, seed=1, rr_depth=4, chunk=256,
           progress=False):
    """Returns the (h,w,3) float64 mean-radiance image."""
    tr, cam = extract(sc)
    rng = np.random.default_rng(np.random.PCG64(seed))
    is_emitter = tr["emit"].max(axis=1) > 0
    lt = np.nonzero(is_emitter)[0]
    lt_area = tr["area"][lt]
    a_total = lt_area.sum()
    lt_cdf = np.cumsum(lt_area) / a_total
    t2w = cam["t2w"]
    tan_half = np.tan(0.5 * cam["fov_x"])

    img = np.zeros((h * w, 3))
    px = np.tile(np.arange(w), h).astype(np.float64)
    py = np.repeat(np.arange(h), w).astype(np.float64)
    B = h * w

    for s in range(spp):
        if progress and s % 16 == 0:
            print(f"  spp {s}/{spp}", flush=True)
        fx = px + rng.random(B)
        fy = py + rng.random(B)
        xc = (2.0 * fx / w - 1.0) * tan_half
        yc = (1.0 - 2.0 * fy / h) * tan_half * (h / w)
        d_cam = np.stack([xc, yc, np.ones(B)], axis=1)
        d_cam /= np.linalg.norm(d_cam, axis=1, keepdims=True)
        d = d_cam @ t2w[:3, :3].T
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(t2w[:3, 3], (B, 3)).copy()

        L = np.zeros((B, 3))
        beta = np.ones((B, 3))
        prev_pdf = np.zeros(B)
        prev_delta = np.ones(B, bool)
        alive = np.ones(B, bool)
        idx = np.arange(B)

        for depth in range(max_depth):
            if not alive.any():
                break
            ai = idx[alive]
            t, ti, uu, vv = intersect(tr, o[ai], d[ai],
                                      np.full(ai.size, np.inf), chunk)
            hit = ti >= 0
            hi = ai[hit]
            tih = ti[hit]
            p = o[hi] + t[hit, None] * d[hi]
            ng = tr["ng"][tih]
            ns = (tr["n0"][tih] * (1 - uu[hit] - vv[hit])[:, None]
                  + tr["n1"][tih] * uu[hit][:, None]
                  + tr["n2"][tih] * vv[hit][:, None])
            ns /= np.maximum(np.linalg.norm(ns, axis=1, keepdims=True), 1e-20)
            wi = -d[hi]

            # emitted radiance (one-sided along ng) with MIS vs NEE
            em = is_emitter[tih]
            front = np.einsum("bk,bk->b", ng, wi) > 0
            if em.any():
                sel = em & front
                dist2 = t[hit] ** 2
                cos_l = np.einsum("bk,bk->b", ng, wi)
                pdf_l = dist2 / np.maximum(cos_l * a_total, 1e-12)
                w_hit = np.where(prev_delta[hi], 1.0,
                                 power_h(prev_pdf[hi], pdf_l))
                L[hi[sel]] += (beta[hi[sel]] * tr["emit"][tih[sel]]
                               * w_hit[sel, None])

            # NEE: uniform-area sample over all emitter area
            nb = hi.size
            if nb:
                li = lt[np.searchsorted(lt_cdf, rng.random(nb), side="left")]
                su = rng.random(nb)
                sv = rng.random(nb)
                flip = su + sv > 1
                su = np.where(flip, 1 - su, su)
                sv = np.where(flip, 1 - sv, sv)
                lp = tr["v0"][li] + su[:, None] * tr["e1"][li] \
                    + sv[:, None] * tr["e2"][li]
                dl = lp - p
                dist = np.linalg.norm(dl, axis=1)
                dln = dl / np.maximum(dist, 1e-20)[:, None]
                cos_l = -np.einsum("bk,bk->b", tr["ng"][li], dln)
                cos_s = np.einsum("bk,bk->b", ns, dln)
                pdf_sa = dist ** 2 / np.maximum(cos_l * a_total, 1e-12)
                f_nee, bsdf_pdf_nee = eval_bsdf(tr, tih, wi, dln, ns)
                valid = (cos_l > 0) & (cos_s > 0) & (f_nee.max(axis=1) > 0)
                if valid.any():
                    occ = np.ones(nb, bool)
                    sgn = np.sign(np.einsum("bk,bk->b", ng[valid],
                                            dln[valid]))
                    occ[valid] = occluded(
                        tr, p[valid] + ng[valid] * 1e-5 * sgn[:, None],
                        dln[valid], dist[valid], chunk)
                    w_nee = power_h(pdf_sa, bsdf_pdf_nee)
                    c = (beta[hi] * tr["emit"][li] * f_nee
                         * (w_nee / np.maximum(pdf_sa, 1e-20))[:, None])
                    add = valid & ~occ
                    L[hi[add]] += c[add]

            # BSDF sample -> continuation
            wo, weight, pdf_fwd, delta = sample_bsdf(tr, tih, wi, ns, rng)
            beta[hi] *= weight
            prev_pdf[hi] = pdf_fwd
            prev_delta[hi] = delta
            o[hi] = p + np.sign(np.einsum("bk,bk->b", ng, wo))[:, None] \
                * ng * 1e-5
            d[hi] = wo

            new_alive = np.zeros(B, bool)
            new_alive[hi] = (weight.max(axis=1) > 0) & (depth + 1 < max_depth)
            # Russian roulette (unbiased; scheme independent of production's)
            if depth >= rr_depth:
                q = np.clip(beta[hi].max(axis=1), 0.05, 0.95)
                srv = rng.random(hi.size) < q
                beta[hi[srv]] /= q[srv, None]
                kill = np.zeros(B, bool)
                kill[hi[~srv]] = True
                new_alive &= ~kill
            alive = new_alive
        img += L
    return (img / spp).reshape(h, w, 3)


def eval_bsdf(tr, ti, wi, wo, ns):
    """f (with cos_o folded) and solid-angle pdf for direction wo."""
    from cudatracerlib_tpu.scene import schema
    cos_i = np.einsum("bk,bk->b", ns, wi)
    cos_o = np.einsum("bk,bk->b", ns, wo)
    up = (cos_i > 0) & (cos_o > 0)
    mt = tr["mtype"][ti]
    f = tr["refl"][ti] * (INV_PI * np.maximum(cos_o, 0.0))[:, None]
    pdf = np.maximum(cos_o, 0.0) * INV_PI
    is_gc = mt == schema.BSDF_ROUGHCONDUCTOR
    if is_gc.any():
        a = tr["alpha"][ti]
        hv = wi + wo
        hn = np.linalg.norm(hv, axis=1)
        hv = hv / np.maximum(hn, 1e-20)[:, None]
        cos_h = np.einsum("bk,bk->b", ns, hv)
        d_ = ggx_d(cos_h, a)
        g = smith_g1(cos_i, a) * smith_g1(cos_o, a)
        cd = np.clip(np.einsum("bk,bk->b", hv, wi), 0, 1)
        F = fresnel_conductor(cd, tr["eta_c"][ti], tr["k_c"][ti])
        spec = F * (d_ * g / np.maximum(4.0 * cos_i, 1e-12))[:, None]
        pdf_gc = d_ * np.maximum(cos_h, 0.0) / np.maximum(4.0 * cd, 1e-12)
        f = np.where(is_gc[:, None], spec, f)
        pdf = np.where(is_gc, pdf_gc, pdf)
    f = np.where(up[:, None], f, 0.0)
    pdf = np.where(up, pdf, 0.0)
    return f, pdf


def sample_bsdf(tr, ti, wi, ns, rng):
    from cudatracerlib_tpu.scene import schema
    nb = ti.size
    mt = tr["mtype"][ti]
    cos_i = np.einsum("bk,bk->b", ns, wi)
    # diffuse: cosine
    wo, pdf = cos_sample(ns, rng.random(nb), rng.random(nb))
    weight = np.where((cos_i > 0)[:, None], tr["refl"][ti], 0.0)
    is_gc = mt == schema.BSDF_ROUGHCONDUCTOR
    if is_gc.any():
        a = tr["alpha"][ti]
        u1 = rng.random(nb)
        u2 = rng.random(nb)
        c_h = np.sqrt(np.clip((1 - u1) / (u1 * (a * a - 1) + 1), 0, 1))
        s_h = np.sqrt(np.maximum(1 - c_h * c_h, 0))
        phi = 2 * np.pi * u2
        t, bt = make_frame(ns)
        hv = (s_h * np.cos(phi))[:, None] * t \
            + (s_h * np.sin(phi))[:, None] * bt + c_h[:, None] * ns
        cd = np.einsum("bk,bk->b", hv, wi)
        wo_g = 2.0 * cd[:, None] * hv - wi
        f_g, pdf_g = eval_bsdf(tr, ti, wi, wo_g, ns)
        w_g = np.where((pdf_g > 1e-12)[:, None],
                       f_g / np.maximum(pdf_g, 1e-12)[:, None], 0.0)
        wo = np.where(is_gc[:, None], wo_g, wo)
        pdf = np.where(is_gc, pdf_g, pdf)
        weight = np.where(is_gc[:, None], w_g, weight)
    return wo, weight, pdf, np.zeros(nb, bool)


# ---------------------------------------------------------------------------

def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    from cudatracerlib_tpu.utils import example_scenes
    if which == "cornell":
        # no tessellated sphere: 12 tris keep the no-BVH renderer tractable
        # on one core; GI/NEE/MIS transport is exercised in full
        w = h = 64
        sc = example_scenes.cornell_box(w, h, spheres=False)
    else:
        w = h = 48
        sc = example_scenes.veach_mis_anchor(w, h)
    img = render(sc, w, h, spp, progress=True)
    img2 = render(sc, w, h, spp, seed=2)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", f"ref_{which}.npz")
    np.savez_compressed(out, img=img.astype(np.float32),
                        img_seed2=img2.astype(np.float32),
                        spp=spp, w=w, h=h, max_depth=8)
    d = img - img2
    rms = float(np.sqrt((d * d).mean()))
    print(f"wrote {out}; mean={img.mean():.4f} "
          f"seed-to-seed RMSE={rms:.5f} (the MC noise floor)")


if __name__ == "__main__":
    main()
