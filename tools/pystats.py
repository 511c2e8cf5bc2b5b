"""Pure-python statistical primitives for the independent query oracles.

No scipy in the sandbox, so the special functions are implemented from the
standard mathematical definitions (power series / continued fractions for
the regularized incomplete gamma and beta functions). Accuracy ~1e-12 over
the parameter ranges the oracles use — far tighter than the 1e-6 relative
tolerance the comparisons apply.
"""
import math


def _gamma_series(a, x, eps=1e-15, itmax=500):
    """P(a, x) by power series (valid x < a + 1)."""
    term = 1.0 / a
    total = term
    n = a
    for _ in range(itmax):
        n += 1.0
        term *= x / n
        total += term
        if abs(term) < abs(total) * eps:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gamma_cf(a, x, eps=1e-15, itmax=500):
    """Q(a, x) by continued fraction (valid x >= a + 1), modified Lentz."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, itmax + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def gammainc_upper_reg(a, x):
    """Regularized upper incomplete gamma Q(a, x)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_series(a, x)
    return _gamma_cf(a, x)


def chi2_sf(x, df):
    """Upper-tail p of a chi-square statistic."""
    if df <= 0 or x != x:
        return float("nan")
    if x <= 0:
        return 1.0
    return gammainc_upper_reg(df / 2.0, x / 2.0)


def _betacf(a, b, x, eps=1e-15, itmax=500):
    """Continued fraction for the incomplete beta (modified Lentz)."""
    tiny = 1e-300
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, itmax + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc_reg(a, b, x):
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log(1.0 - x))
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def f_sf(f, d1, d2):
    """Upper-tail p of an F statistic."""
    if d1 <= 0 or d2 <= 0 or f != f:
        return float("nan")
    if f <= 0:
        return 1.0
    return betainc_reg(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))


def t_cdf(t, df):
    if df <= 0:
        return float("nan")
    x = df / (df + t * t)
    p = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return p if t < 0 else 1.0 - p


def t_inv(p, df, sas_low_df_workaround=False):
    """Quantile of the t distribution by bisection on t_cdf (mirrors the
    engine's SAS df<1.12 workaround when asked)."""
    if sas_low_df_workaround and df < 1.12:
        df = 1.12
    if df <= 0 or p <= 0 or p >= 1:
        return float("nan")
    lo, hi = -1e8, 1e8
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def fisher_2xc(row1, row2, max_n=2000):
    """Two-sided Freeman-Halton exact p for a 2xC table; None when n exceeds
    the enumeration budget (the engine then falls back to chi-square).
    Two-sided rule: sum of probabilities of all same-margin tables whose
    point probability <= observed (x 1+1e-7 slack)."""
    keep = [j for j in range(len(row1)) if row1[j] + row2[j] > 0]
    if not keep:
        return float("nan")
    col_tot = [row1[j] + row2[j] for j in keep]
    r1 = sum(row1[j] for j in keep)
    n = sum(col_tot)
    if n == 0:
        return float("nan")
    if r1 == 0 or r1 == n:
        return 1.0
    if len(keep) == 1:
        return 1.0
    if n > max_n:
        return None

    def lch(nn, k):
        if k < 0 or k > nn:
            return float("-inf")
        return (math.lgamma(nn + 1) - math.lgamma(k + 1)
                - math.lgamma(nn - k + 1))

    lnorm = lch(n, r1)
    lp_obs = sum(lch(col_tot[t], row1[keep[t]]) for t in range(len(keep)))
    cutoff = lp_obs + math.log1p(1e-7)
    # recursive enumeration over columns (tables are small once n <= max_n
    # and C is the distinct-category count)
    suf_cap = [0] * (len(col_tot) + 1)
    for j in range(len(col_tot) - 1, -1, -1):
        suf_cap[j] = suf_cap[j + 1] + col_tot[j]

    total = [0.0]

    def rec(j, rem, acc):
        if j == len(col_tot):
            if rem == 0 and acc <= cutoff:
                total[0] += math.exp(acc - lnorm)
            return
        x_lo = max(0, rem - suf_cap[j + 1])
        x_hi = min(col_tot[j], rem)
        for x in range(x_lo, x_hi + 1):
            rec(j + 1, rem - x, acc + lch(col_tot[j], x))

    rec(0, r1, 0.0)
    return min(1.0, total[0])


def holm(ps):
    """Holm step-down over a list (NaN entries pass through as NaN)."""
    idx = [(p, i) for i, p in enumerate(ps) if p == p]
    m = len(idx)
    out = [float("nan")] * len(ps)
    running = 0.0
    for j, (p, i) in enumerate(sorted(idx), start=1):
        adj = min(1.0, (m - j + 1) * p)
        running = max(running, adj)
        out[i] = running
    return out


def simhash64(text):
    """64-bit simhash of the whitespace tokens of `text` (md5 per token,
    first 8 bytes big-endian as the token hash), matching the engine's
    deterministic construction. Returns a SIGNED 64-bit int like the JVM."""
    import hashlib
    t = text.strip()
    tokens = [] if len(t) == 0 else [w for w in t.split(" ") if w != ""]
    counts = [0] * 64
    for tok in tokens:
        dig = hashlib.md5(tok.encode("utf-8")).digest()
        h = int.from_bytes(dig[:8], "big")
        for bit in range(64):
            if (h >> bit) & 1:
                counts[bit] += 1
            else:
                counts[bit] -= 1
    out = 0
    for bit in range(64):
        if counts[bit] > 0:
            out |= 1 << bit
    if out >= 1 << 63:
        out -= 1 << 64
    return out
