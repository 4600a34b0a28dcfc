"""Binomial confidence bounds for theta-sketch estimates.

Port of the reference's contract (`common/binomial_bounds.rs:288-342`):
frequentist bounds on the unknown true distinct count n given
``num_samples`` retained entries at sampling probability ``theta``.

Branch structure mirrors the reference exactly:

- theta == 1: exact mode, lb = ub = num_samples;
- num_samples == 0: lb = 0, ub = ceil(ln(delta)/ln(1-theta));
- num_samples == 1 (lb): floor(ln(1-delta)/ln(1-theta));
- num_samples > 120: Gaussian with continuity correction
  (cont_classic, binomial_bounds.rs:469-485) -/+ 0.5;
- 2 <= num_samples <= 120, theta > 1-1e-5: lb = n, ub = n+1;
- 2 <= num_samples <= 120 otherwise: the "exact" Bayesian tail walk
  (special_n_star / special_n_prime_f, binomial_bounds.rs:518-605).
  The reference bails out of the walk when est = n/theta >= 500 (Rust
  perf guard) and substitutes a table-corrected Gaussian
  (LB/UB_EQUIV_TABLE); here the walk runs in log space so it stays
  numerically safe and we extend it to est <= 2e5, falling back to the
  plain-z Gaussian beyond that (documented deviation: only reachable
  when a <=120-entry sketch claims an estimate above 200k).

Final clamps are the reference's: lb = min(est, max(n, raw_lb)),
ub = max(est, raw_ub).
"""

from __future__ import annotations

import math

_TAIL = {1: None, 2: None, 3: None}  # filled below


def _normal_cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _delta_of_num_stdevs(z: float) -> float:
    return _normal_cdf(-z)


for _z in (1, 2, 3):
    _TAIL[_z] = _delta_of_num_stdevs(float(_z))


def _cont_classic_lb(n: int, theta: float, z: float) -> float:
    n_hat = (n - 0.5) / theta
    b = z * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b - d


def _cont_classic_ub(n: int, theta: float, z: float) -> float:
    n_hat = (n + 0.5) / theta
    b = z * math.sqrt((1.0 - theta) / theta)
    d = 0.5 * b * math.sqrt(b * b + 4.0 * n_hat)
    return n_hat + 0.5 * b * b + d


def _tail_walk(k: int, p: float, target: float, max_iter: int) -> int | None:
    """Smallest m with sum_{j=k..m} C(j-1,k-1) p^k q^(j-k) > target.

    The running total is P(Binomial(m, p) >= k); the recurrence is the
    reference's (term *= q*m/(m+1-k)), executed in log space so p^k
    never underflows. Returns None if max_iter is exhausted.
    """
    q = 1.0 - p
    log_q = math.log(q)
    log_term = k * math.log(p)
    tot = math.exp(log_term)
    m = k
    for _ in range(max_iter):
        if tot > target:
            return m
        log_term += log_q + math.log(m) - math.log(m + 1 - k)
        tot += math.exp(log_term)
        m += 1
    return None


def _special_n_star(k: int, p: float, delta: float, max_iter: int = 200_000) -> int | None:
    """Largest m with P(Bin(m,p) >= k) <= delta (binomial_bounds.rs:518)."""
    m = _tail_walk(k, p, delta, max_iter)
    return None if m is None else m - 1


def _special_n_prime_f(k: int, p: float, delta: float, max_iter: int = 200_000) -> int | None:
    """Smallest m with P(Bin(m,p) >= k+1) >= 1-delta (binomial_bounds.rs:597),
    via n_prime_b(k+1) (same walk, >= 1-delta stop, no back-up)."""
    kk = k + 1
    q = 1.0 - p
    log_q = math.log(q)
    log_term = kk * math.log(p)
    tot = math.exp(log_term)
    m = kk
    one_minus_delta = 1.0 - delta
    for _ in range(max_iter):
        if tot >= one_minus_delta:
            return m
        log_term += log_q + math.log(m) - math.log(m + 1 - kk)
        tot += math.exp(log_term)
        m += 1
    return None


def _raw_lower(n: int, theta: float, z: int) -> float:
    if theta == 1.0:
        return float(n)
    if n == 0:
        return 0.0
    delta = _TAIL[z]
    if n == 1:
        return math.floor(math.log(1.0 - delta) / math.log(1.0 - theta))
    if n > 120:
        return _cont_classic_lb(n, theta, float(z)) - 0.5
    if theta > 1.0 - 1e-5:
        return float(n)
    m = _special_n_star(n, theta, delta)
    if m is not None:
        return float(m)
    return _cont_classic_lb(n, theta, float(z)) - 0.5


def _raw_upper(n: int, theta: float, z: int) -> float:
    if theta == 1.0:
        return float(n)
    delta = _TAIL[z]
    if n == 0:
        return math.ceil(math.log(delta) / math.log(1.0 - theta))
    if n > 120:
        return _cont_classic_ub(n, theta, float(z)) + 0.5
    if theta > 1.0 - 1e-5:
        return float(n + 1)
    m = _special_n_prime_f(n, theta, delta)
    if m is not None:
        return float(m)
    return _cont_classic_ub(n, theta, float(z)) + 0.5


def lower_bound(num_samples: int, theta: float, num_std_devs: int = 2) -> float:
    """Reference ``lower_bound`` (binomial_bounds.rs:288-309)."""
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    if num_std_devs not in (1, 2, 3):
        raise ValueError("num_std_devs must be 1, 2 or 3")
    est = num_samples / theta
    raw = _raw_lower(num_samples, theta, num_std_devs)
    return min(est, max(float(num_samples), raw))


def upper_bound(
    num_samples: int, theta: float, num_std_devs: int = 2, no_data_seen: bool = False
) -> float:
    """Reference ``upper_bound`` (binomial_bounds.rs:323-342)."""
    if no_data_seen:
        return 0.0
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"theta must be in (0, 1], got {theta}")
    if num_std_devs not in (1, 2, 3):
        raise ValueError("num_std_devs must be 1, 2 or 3")
    est = num_samples / theta
    raw = _raw_upper(num_samples, theta, num_std_devs)
    return max(est, raw)


# ------------------------------------------------------- proportion bounds
# approximate bounds on an unknown binomial proportion p given k successes
# in n trials (binomial_bounds.rs:345-467) — closed forms, no tables.


def _abramowitz_stegun_26p5p22(a: float, b: float, yp: float) -> float:
    """A&S formula 26.5.22: normal approximation to the inverse
    incomplete-beta used by the reference (binomial_bounds.rs:439-450)."""
    b2m1 = 2.0 * b - 1.0
    a2m1 = 2.0 * a - 1.0
    lam = (yp * yp - 3.0) / 6.0
    h = 2.0 / (1.0 / a2m1 + 1.0 / b2m1)
    term1 = yp * math.sqrt(h + lam) / h
    term2 = 1.0 / b2m1 - 1.0 / a2m1
    term3 = lam + 5.0 / 6.0 - 2.0 / (3.0 * h)
    w = term1 - term2 * term3
    return a / (a + b * math.exp(2.0 * w))


def approximate_lower_bound_on_p(n: int, k: int, num_std_devs: float) -> float:
    """binomial_bounds.rs:345-367."""
    if k > n:
        raise ValueError(f"k cannot exceed n: k={k}, n={n}")
    if n == 0 or k == 0:
        return 0.0
    delta = _delta_of_num_stdevs(num_std_devs)
    if k == 1:
        return 1.0 - math.pow(1.0 - delta, 1.0 / n)
    if k == n:
        return math.pow(delta, 1.0 / n)
    return 1.0 - _abramowitz_stegun_26p5p22((n - k) + 1.0, float(k), -num_std_devs)


def approximate_upper_bound_on_p(n: int, k: int, num_std_devs: float) -> float:
    """binomial_bounds.rs:370-392."""
    if k > n:
        raise ValueError(f"k cannot exceed n: k={k}, n={n}")
    if n == 0 or k == n:
        return 1.0
    delta = _delta_of_num_stdevs(num_std_devs)
    if k == n - 1:
        return math.pow(1.0 - delta, 1.0 / n)
    if k == 0:
        return 1.0 - math.pow(delta, 1.0 / n)
    return 1.0 - _abramowitz_stegun_26p5p22(float(n - k), k + 1.0, num_std_devs)


def _sampling_adjuster(p: float) -> float:
    """jaccard_similarity.rs:334-341."""
    adj = math.sqrt(1.0 - p)
    return adj if p <= 0.5 else adj + 0.01 * (p - 0.5)
