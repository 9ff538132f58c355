"""Exact WGS84 geodesic inverse — auxiliary-sphere integrals, no series.

Completes the engine's ellipsoidal-geodesic story (the reference delegates to
Karney's algorithm, R/referencing/GeodeticCalculator.java:405): Vincenty
(functions/geometry.geodesic_inverse_m) stays the fast vectorized path, and
THIS module solves the near-antipodal pairs where Vincenty's fixed-point
iteration diverges — previously a documented haversine fallback.

Method (Karney 2013, "Algorithms for geodesics", J. Geodesy 87:43-55 —
public): a geodesic maps to a great circle on the auxiliary sphere with node
azimuth alpha0 (Clairaut: sin(alpha0) = sin(alpha) cos(beta), beta the
reduced latitude).  With sigma the arc from the node, the exact relations

    s      = b * integral  sqrt(1 + k^2 sin^2 s') ds'         (eq. 7)
    lambda = omega - f sin(alpha0) *
             integral (2 - f) / (1 + (1 - f) sqrt(1 + k^2 sin^2 s')) ds'
                                                              (eq. 8)
    k = e' cos(alpha0),  tan(omega) = sin(alpha0) tan(sigma)

hold without truncation.  Instead of the paper's 6th-order series we evaluate
both integrals with fixed 20-point Gauss-Legendre quadrature: the integrands
are analytic with |k^2| <= e'^2 ~ 0.00674, so the quadrature error is below
1e-14 relative — simpler than the series and immune to transcription bugs.

The departure azimuth alpha1 solves lambda(alpha1) = lambda12.  We scan a
241-point grid over [0, pi] (lambda12 normalized to [0, pi] by mirror
symmetry), resolving the ascending/descending latitude-crossing branch for
sigma2 empirically per candidate, then polish the best grid cell with
golden-section on |lambda - lambda12|.  The final residual is returned so
callers (and tests) can verify convergence per row instead of trusting it.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F = 1.0 / 298.257223563
_B = _A * (1.0 - _F)
_EP2 = (_A * _A - _B * _B) / (_B * _B)  # second eccentricity squared

_GL_X, _GL_W = np.polynomial.legendre.leggauss(20)


def _integrals(sig1, sig2, k2, salp0):
    """(s/b, lambda-correction) = GL quadrature of eqs. 7/8 over [sig1, sig2].

    All inputs broadcastable arrays; returns (I1, f*salp0*I3)."""
    half = 0.5 * (sig2 - sig1)
    mid = 0.5 * (sig2 + sig1)
    # nodes axis prepended: (20, ...) then weighted-summed away
    sig = mid[None, ...] + half[None, ...] * _GL_X.reshape((-1,) + (1,) * mid.ndim)
    w = np.sqrt(1.0 + k2[None, ...] * np.sin(sig) ** 2)
    i1 = np.einsum("i...,i->...", w, _GL_W) * half
    i3 = np.einsum("i...,i->...", (2.0 - _F) / (1.0 + (1.0 - _F) * w), _GL_W) * half
    return i1, _F * salp0 * i3


def _lambda_of(alpha1, beta1, beta2, lam12):
    """For trial azimuth(s) alpha1: the best-branch (lambda error, sigma1,
    sigma2, k2, salp0) of the geodesic leaving (beta1, .) at alpha1 and
    crossing latitude beta2 within the next half-turn."""
    sb1, cb1 = np.sin(beta1), np.cos(beta1)
    sb2 = np.sin(beta2)
    sal, cal = np.sin(alpha1), np.cos(alpha1)
    salp0 = sal * cb1
    calp0 = np.sqrt(np.maximum(1.0 - salp0**2, 0.0))
    k2 = _EP2 * calp0**2
    sig1 = np.arctan2(sb1, cal * cb1)
    om1 = np.arctan2(salp0 * np.sin(sig1), np.cos(sig1))

    # sigma2 candidates.  sin(sigma2) = sin(beta2)/cos(alpha0) is ill-
    # conditioned near the apex (value -> 1); get cos(sigma2) from the exact
    # identity cos^2(sigma2) cos^2(alpha0) = cos^2(a1) cos^2(b1)
    # + (sin^2 b1 - sin^2 b2), which stays well-conditioned there.
    q = (cal * cb1) ** 2 + (sb1 - sb2) * (sb1 + sb2)
    reach = q > -1e-14  # latitude beta2 attainable by this geodesic
    calp0_safe = np.maximum(calp0, 1e-300)
    ssig2 = np.clip(sb2 / calp0_safe, -1.0, 1.0)
    csig2 = np.sqrt(np.maximum(q, 0.0)) / calp0_safe
    asc = np.arctan2(ssig2, csig2)   # ascending-side crossing
    dsc = np.arctan2(ssig2, -csig2)  # descending-side crossing

    best_err = np.full(np.broadcast(alpha1, beta1).shape, np.inf)
    best_sig2 = np.zeros_like(best_err)
    two_pi = 2.0 * np.pi
    for base in (asc, dsc):
        # unique representative of base (mod 2pi) in (sig1, sig1 + pi]
        c = base + two_pi * np.ceil((sig1 - base) / two_pi)
        ok = reach & (c > sig1) & (c <= sig1 + np.pi + 1e-12)
        c = np.where(ok, c, sig1 + 0.1)  # placeholder keeps quadrature finite
        om2 = np.arctan2(salp0 * np.sin(c), np.cos(c))
        dom = np.mod(om2 - om1, two_pi)
        _, lcorr = _integrals(sig1, c, k2, salp0)
        lam = dom - lcorr
        err = lam - lam12
        err = np.where(ok, err, np.inf)
        upd = np.abs(err) < np.abs(best_err)
        best_err = np.where(upd, err, best_err)
        best_sig2 = np.where(upd, c, best_sig2)
    return best_err, sig1, best_sig2, k2, salp0


def inverse_m(lon1, lat1, lon2, lat2, grid: int = 241, iters: int = 70):
    """Exact geodesic distance (meters) on WGS84 for arbitrary pairs,
    including near-antipodal.  Returns (dist_m, alpha1_rad, residual_rad);
    residual is |lambda(alpha1) - lambda12| at the solution — convergence is
    *verifiable*, not assumed."""
    lon1 = np.atleast_1d(np.asarray(lon1, np.float64))
    lat1 = np.atleast_1d(np.asarray(lat1, np.float64))
    lon2 = np.atleast_1d(np.asarray(lon2, np.float64))
    lat2 = np.atleast_1d(np.asarray(lat2, np.float64))
    beta1 = np.arctan((1.0 - _F) * np.tan(np.radians(lat1)))
    beta2 = np.arctan((1.0 - _F) * np.tan(np.radians(lat2)))
    # normalize: lambda12 in [0, pi] (east-west mirror symmetry of distance)
    lam12 = np.radians((lon2 - lon1 + 180.0) % 360.0 - 180.0)
    lam12 = np.abs(lam12)

    n = lam12.shape[0]
    dist = np.zeros(n)
    alpha = np.zeros(n)
    resid = np.zeros(n)

    same = (np.abs(beta1 - beta2) < 1e-15) & (lam12 < 1e-15)
    # exactly-equatorial pairs within the equatorial cap: the geodesic IS the
    # equator (s = a * lam12); beyond (1-f)*pi the solution leaves the equator
    # and the general machinery below applies (Karney 2013 sec. 5)
    equa = ~same & (np.abs(beta1) < 1e-15) & (np.abs(beta2) < 1e-15) & (
        lam12 <= (1.0 - _F) * np.pi)
    dist[equa] = _A * lam12[equa]
    alpha[equa] = np.pi / 2.0
    todo = ~(same | equa)
    if not todo.any():
        return dist, alpha, resid

    b1, b2, lm = beta1[todo], beta2[todo], lam12[todo]
    # coarse scan: (grid, P)
    agrid = np.linspace(0.0, np.pi, grid)[:, None]
    err, _, _, _, _ = _lambda_of(agrid, b1[None, :], b2[None, :], lm[None, :])
    k = np.argmin(np.abs(err), axis=0)
    step = np.pi / (grid - 1)
    lo = np.clip(agrid[k, 0] - step, 0.0, np.pi)
    hi = np.clip(agrid[k, 0] + step, 0.0, np.pi)

    # golden-section on |err| within the winning cell (vectorized; two
    # evaluations per iteration keeps the state update branch-free)
    gr = (np.sqrt(5.0) - 1.0) / 2.0
    x1 = hi - gr * (hi - lo)
    x2 = lo + gr * (hi - lo)
    f1 = np.abs(_lambda_of(x1, b1, b2, lm)[0])
    f2 = np.abs(_lambda_of(x2, b1, b2, lm)[0])
    for _ in range(iters):
        pick1 = f1 < f2
        hi = np.where(pick1, x2, hi)
        lo = np.where(pick1, lo, x1)
        x1 = hi - gr * (hi - lo)
        x2 = lo + gr * (hi - lo)
        f1 = np.abs(_lambda_of(x1, b1, b2, lm)[0])
        f2 = np.abs(_lambda_of(x2, b1, b2, lm)[0])
    a1 = np.where(f1 < f2, x1, x2)
    fa = np.abs(_lambda_of(a1, b1, b2, lm)[0])

    # second pass: bisection on the SIGNED error over the same cell — golden
    # can stall on the branch-switch kink near steep (near-equatorial) roots;
    # where the cell brackets a sign change, bisection nails it.  Keep
    # whichever result has the smaller residual.
    blo = np.clip(agrid[k, 0] - step, 0.0, np.pi)
    bhi = np.clip(agrid[k, 0] + step, 0.0, np.pi)
    elo = _lambda_of(blo, b1, b2, lm)[0]
    ehi = _lambda_of(bhi, b1, b2, lm)[0]
    bracket = np.isfinite(elo) & np.isfinite(ehi) & (np.sign(elo) != np.sign(ehi))
    for _ in range(60):
        mid = 0.5 * (blo + bhi)
        emid = _lambda_of(mid, b1, b2, lm)[0]
        go_lo = np.sign(emid) == np.sign(elo)
        blo = np.where(bracket & go_lo, mid, blo)
        elo = np.where(bracket & go_lo, emid, elo)
        bhi = np.where(bracket & ~go_lo, mid, bhi)
        ehi = np.where(bracket & ~go_lo, emid, ehi)
    amid = 0.5 * (blo + bhi)
    fmid = np.abs(_lambda_of(amid, b1, b2, lm)[0])
    use_b = bracket & (fmid < fa)
    a1 = np.where(use_b, amid, a1)

    err, sig1, sig2, k2, salp0 = _lambda_of(a1, b1, b2, lm)
    i1, _ = _integrals(sig1, sig2, k2, salp0)
    dist[todo] = _B * i1
    alpha[todo] = a1
    resid[todo] = np.abs(err)
    return dist, alpha, resid


def direct_m(lon1, lat1, alpha1, s_m, iters: int = 80):
    """Exact geodesic DIRECT problem on WGS84: from (lon1, lat1) with
    departure azimuth ``alpha1`` (radians, clockwise from north) travel
    ``s_m`` meters along the geodesic -> (lon2_deg, lat2_deg, alpha2_rad).

    Same auxiliary-sphere machinery as ``inverse_m`` (Karney 2013 eqs. 7/8
    via Gauss-Legendre quadrature, no series): sigma2 solves the monotone
    arc-length equation b * I1(sigma1 -> sigma2) = s by bisection inside
    the analytic bracket [s / (b sqrt(1+k^2)), s / b] — the integrand is
    bounded by those two speeds, so the root is always bracketed and 80
    halvings put it far below 1 mm."""
    lon1 = np.atleast_1d(np.asarray(lon1, np.float64))
    lat1 = np.atleast_1d(np.asarray(lat1, np.float64))
    alpha1 = np.atleast_1d(np.asarray(alpha1, np.float64))
    s_m = np.atleast_1d(np.asarray(s_m, np.float64))

    beta1 = np.arctan((1.0 - _F) * np.tan(np.radians(lat1)))
    sb1, cb1 = np.sin(beta1), np.cos(beta1)
    sal, cal = np.sin(alpha1), np.cos(alpha1)
    salp0 = sal * cb1
    calp0 = np.sqrt(np.maximum(1.0 - salp0**2, 0.0))
    k2 = _EP2 * calp0**2
    sig1 = np.arctan2(sb1, cal * cb1)
    om1 = np.arctan2(salp0 * np.sin(sig1), np.cos(sig1))

    lo = sig1 + s_m / (_B * np.sqrt(1.0 + k2)) - 1e-12
    hi = sig1 + s_m / _B + 1e-12
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        i1, _ = _integrals(sig1, mid, k2, salp0)
        too_far = _B * i1 > s_m
        hi = np.where(too_far, mid, hi)
        lo = np.where(too_far, lo, mid)
    sig2 = 0.5 * (lo + hi)

    ssig2, csig2 = np.sin(sig2), np.cos(sig2)
    sb2 = calp0 * ssig2
    cb2 = np.hypot(calp0 * csig2, salp0)
    lat2 = np.degrees(np.arctan2(sb2, (1.0 - _F) * cb2))
    om2 = np.arctan2(salp0 * ssig2, csig2)
    # unwrap omega so multi-turn geodesics accumulate longitude
    turns = np.round((sig2 - sig1) / (2.0 * np.pi))
    om2 = om2 + 2.0 * np.pi * turns
    _, lcorr = _integrals(sig1, sig2, k2, salp0)
    lam = (om2 - om1) - lcorr
    lon2 = (lon1 + np.degrees(lam) + 180.0) % 360.0 - 180.0
    alpha2 = np.arctan2(salp0, calp0 * csig2)
    return lon2, lat2, alpha2


# ------------------------------------------------ spherical polygon excess
# Girard's theorem (public literature): the area of a spherical polygon is
# R^2 * (sum of interior angles - (n-2)*pi).  Interior angles come from two
# forward-azimuth evaluations per vertex (prev and next), so the whole
# computation is ONE shared Spark/DuckDB expression text over radian vertex
# columns — each angle floor-quantized at 1e9 BEFORE the per-polygon integer
# sum (order-independent, the tfidf discipline).  This is the geodesic
# ST_Area companion to the planar shoelace in sqlmm.ST_Area.


def interior_angle_q_sql() -> str:
    """Shared expression text: quantized CCW interior angle at vertex B
    from radian columns (la, pa) prev, (lb, pb) current, (lc, pc) next:
    mod_2pi(azimuth(B->next) - azimuth(B->prev))."""
    aza = (
        "atan2(sin(la - lb) * cos(pa),"
        " cos(pb) * sin(pa) - sin(pb) * cos(pa) * cos(la - lb))"
    )
    azc = (
        "atan2(sin(lc - lb) * cos(pc),"
        " cos(pb) * sin(pc) - sin(pb) * cos(pc) * cos(lc - lb))"
    )
    d = f"(({azc}) - ({aza}))"
    wrapped = (
        f"(CASE WHEN {d} < 0.0 THEN {d} + 6.283185307179586 ELSE {d} END)"
    )
    return (
        f"CAST(floor({wrapped} * 1.0e9 + 0.12345678987) AS BIGINT)"
    )


def spherical_excess_angles(verts) -> "DataFrame":
    """Per-polygon quantized interior-angle sum -> (key, nv, sum_ang_q)
    from a CCW vertex table (key, k, nv, vx, vy) in DEGREES.  The caller
    derives excess_q = sum_ang_q - (nv-2)*pi_q; kept as the raw sum so no
    quantized-pi convention leaks into the contract.

    Scale shape: two (key, k)-equi self-joins (fan-out 1) + one keyed
    aggregation; the trig is whole-stage codegen via the shared text."""
    from pyspark.sql import functions as F

    b = verts.select("key", "k", "nv", "vx", "vy")
    prev = b.select(
        "key",
        ((F.col("k") + 1) % F.col("nv")).alias("k"),
        F.radians("vx").alias("la"),
        F.radians("vy").alias("pa"),
    )
    nxt = b.select(
        "key",
        ((F.col("k") + F.col("nv") - 1) % F.col("nv")).alias("k"),
        F.radians("vx").alias("lc"),
        F.radians("vy").alias("pc"),
    )
    cur = b.select(
        "key", "k", "nv",
        F.radians("vx").alias("lb"),
        F.radians("vy").alias("pb"),
    )
    j = cur.join(prev, ["key", "k"]).join(nxt, ["key", "k"])
    return (
        j.select("key", "nv", F.expr(interior_angle_q_sql()).alias("aq"))
        .groupBy("key", "nv")
        .agg(F.sum("aq").alias("sum_ang_q"))
        .select("key", "nv", "sum_ang_q")
    )
