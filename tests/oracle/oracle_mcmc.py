"""NumPy oracle: a reference-equivalent reimplementation of ip_mcmc.

The reference mount was empty (SURVEY.md §0), so this module re-derives the
reference's semantics from its documented design (SURVEY.md §§1–3): the
strategy-composition kernel — ``MCMCSampler`` driving pluggable Proposer /
Accepter / Potential / Distribution objects, pure NumPy, single process,
single chain, sequential steps.

It serves two purposes (SURVEY.md §7.2 step 1):
1. correctness oracle for the TPU engine (distributional agreement tests);
2. the "reference side" of every benchmark (ESS/sec of the NumPy loop is the
   baseline the TPU engine must beat ≥10×, per BASELINE.json).

Deliberately written in the reference's idiom: Python ``for`` loop over
steps, per-step object dispatch, dense NumPy linalg. Do not optimize.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- layer L1
class GaussianDistribution:
    """N(mean, cov). Reference: ip_mcmc/distribution.py::GaussianDistribution
    (expected location; mount empty — SURVEY.md §2.1 [H])."""

    def __init__(self, mean, covariance):
        self.mean = np.asarray(mean, dtype=float)
        self.covariance = np.asarray(covariance, dtype=float)
        if self.covariance.ndim == 1:
            self.covariance = np.diag(self.covariance)
        self._chol = np.linalg.cholesky(self.covariance)
        sign, self._logdet = np.linalg.slogdet(self.covariance)
        assert sign > 0

    @property
    def dim(self):
        return self.mean.shape[0]

    def sample(self, rng):
        return self.mean + self._chol @ rng.standard_normal(self.dim)

    def sample_centered(self, rng):
        return self._chol @ rng.standard_normal(self.dim)

    def apply_covariance_sqrt(self, z):
        return self._chol @ z

    def log_density(self, x):
        d = x - self.mean
        w = np.linalg.solve(self._chol, d)
        return -0.5 * w @ w - 0.5 * self._logdet - 0.5 * self.dim * np.log(2 * np.pi)

    def density(self, x):
        return np.exp(self.log_density(x))

    def potential(self, x):
        d = x - self.mean
        w = np.linalg.solve(self._chol, d)
        return 0.5 * w @ w


class LogNormalDistribution:
    """Componentwise log-normal (SURVEY.md §2.1 [M])."""

    def __init__(self, mu, sigma):
        self.mu = np.asarray(mu, dtype=float)
        self.sigma = np.asarray(sigma, dtype=float)

    @property
    def dim(self):
        return self.mu.shape[0]

    def sample(self, rng):
        return np.exp(self.mu + self.sigma * rng.standard_normal(self.dim))

    def log_density(self, x):
        logx = np.log(x)
        z = (logx - self.mu) / self.sigma
        return float(
            np.sum(-0.5 * z * z - logx - np.log(self.sigma) - 0.5 * np.log(2 * np.pi))
        )

    def density(self, x):
        return np.exp(self.log_density(x))


class IndependentDistributions:
    """Product of independent marginals (SURVEY.md §2.1 [M])."""

    def __init__(self, distributions):
        self.distributions = list(distributions)

    @property
    def dim(self):
        return sum(d.dim for d in self.distributions)

    def _split(self, x):
        out, off = [], 0
        for d in self.distributions:
            out.append(x[off : off + d.dim])
            off += d.dim
        return out

    def sample(self, rng):
        return np.concatenate([d.sample(rng) for d in self.distributions])

    def log_density(self, x):
        return sum(
            d.log_density(p) for d, p in zip(self.distributions, self._split(x))
        )

    def density(self, x):
        return np.exp(self.log_density(x))


# ---------------------------------------------------------------- layer L2
class AnalyticPotential:
    """Φ = −log density for a closed-form target (SURVEY.md §2.1 [H])."""

    def __init__(self, log_density_fn):
        self._log_density_fn = log_density_fn

    def __call__(self, u):
        return -self._log_density_fn(u)


class EvolutionPotential:
    """Φ(u) = ½‖Γ^{-1/2}(y − O(G(u)))‖² (SURVEY.md §2.1/§3.4 [H]).

    ``evolution`` is the forward operator G, ``observation`` the restriction
    O (optional), ``noise`` a GaussianDistribution for Γ.
    """

    def __init__(self, evolution, data, noise, observation=None):
        self.evolution = evolution
        self.data = np.asarray(data, dtype=float)
        self.noise = noise
        self.observation = observation

    def __call__(self, u):
        pred = self.evolution(u)
        if self.observation is not None:
            pred = self.observation(pred)
        r = self.data - pred
        w = np.linalg.solve(self.noise._chol, r)
        return 0.5 * w @ w


# ---------------------------------------------------------------- layer L3
class StandardRWProposer:
    """v = u + δ ξ (SURVEY.md §2.1 [H])."""

    def __init__(self, delta, dim, covariance_sqrt=None):
        self.delta = delta
        self.dim = dim
        self.covariance_sqrt = covariance_sqrt

    def __call__(self, u, rng):
        xi = rng.standard_normal(self.dim)
        if self.covariance_sqrt is not None:
            xi = self.covariance_sqrt @ xi
        return u + self.delta * xi


class pCNProposer:
    """v = m + √(1−β²)(u − m) + β ξ, ξ ~ N(0, C₀) (SURVEY.md §1.1 [H])."""

    def __init__(self, beta, prior):
        assert 0.0 < beta <= 1.0
        self.beta = beta
        self.prior = prior

    def __call__(self, u, rng):
        xi = self.prior.sample_centered(rng)
        m = self.prior.mean
        return m + np.sqrt(1.0 - self.beta**2) * (u - m) + self.beta * xi


class AnalyticAccepter:
    """Accept with density ratio of a closed-form target (SURVEY.md §3.2)."""

    def __init__(self, density):
        self.density = density

    def __call__(self, u, v, rng):
        ratio = self.density(v) / max(self.density(u), 1e-300)
        return rng.uniform() < min(1.0, ratio)


class StandardRWAccepter:
    """MH accept for RWM on the posterior: potential + prior term."""

    def __init__(self, potential, prior):
        self.potential = potential
        self.prior = prior

    def __call__(self, u, v, rng):
        log_ratio = (
            self.potential(u)
            + self.prior.potential(u)
            - self.potential(v)
            - self.prior.potential(v)
        )
        return np.log(rng.uniform()) < min(0.0, log_ratio)


class pCNAccepter:
    """accept w.p. min(1, exp(Φ(u) − Φ(v))) (SURVEY.md §1.1 [H])."""

    def __init__(self, potential):
        self.potential = potential

    def __call__(self, u, v, rng):
        log_ratio = self.potential(u) - self.potential(v)
        return np.log(rng.uniform()) < min(0.0, log_ratio)


class CountedAccepter:
    """Decorator counting accept rate (SURVEY.md §2.1 [H])."""

    def __init__(self, accepter):
        self.accepter = accepter
        self.calls = 0
        self.accepts = 0

    def __call__(self, u, v, rng):
        self.calls += 1
        accepted = self.accepter(u, v, rng)
        if accepted:
            self.accepts += 1
        return accepted

    @property
    def acceptance_rate(self):
        return self.accepts / max(self.calls, 1)


# ---------------------------------------------------------------- layer L4
class MCMCSampler:
    """Sequential chain loop (SURVEY.md §3.1 [H behavior]).

    run(u0, n_samples, burn_in, sample_interval) -> (n_samples, dim)
    """

    def __init__(self, proposer, accepter, rng):
        self.proposer = proposer
        self.accepter = accepter
        self.rng = rng

    def run(self, u0, n_samples, burn_in=0, sample_interval=1):
        u = np.array(u0, dtype=float)
        samples = []
        total = burn_in + n_samples * sample_interval
        for step in range(total):
            v = self.proposer(u, self.rng)
            if self.accepter(u, v, self.rng):
                u = v
            if step >= burn_in and (step - burn_in) % sample_interval == sample_interval - 1:
                samples.append(u.copy())
        return np.stack(samples)


# ------------------------------------------------------------- diagnostics
def ess_numpy(x):
    """Multi-chain ESS, numerically identical estimator to
    ip_mcmc_tpu.diagnostics.ess (same split/Geyer truncation), pure NumPy.

    x: (n_steps, n_chains) or (n_steps,).
    """
    x = np.asarray(x, dtype=float)
    if x.ndim == 1:
        x = x[:, None]
    n0 = x.shape[0] - (x.shape[0] % 2)
    half = n0 // 2
    x = np.concatenate([x[:half], x[half:n0]], axis=1)
    n, m = x.shape
    xc = x - x.mean(axis=0, keepdims=True)
    size = 1
    while size < 2 * n:
        size <<= 1
    f = np.fft.rfft(xc, n=size, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=size, axis=0)[:n].real / n
    chain_vars = acov[0] * n / (n - 1)
    mean_acov = acov.mean(axis=1)
    within = chain_vars.mean()
    between_over_n = np.var(x.mean(axis=0), ddof=1)
    var_plus = (n - 1) / n * within + between_over_n
    rho = 1.0 - (within - mean_acov) / var_plus
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)
    positive = pairs > 0
    positive[0] = True
    keep = np.cumprod(positive.astype(int)) > 0
    pairs_mono = np.minimum.accumulate(pairs)
    pairs_used = np.where(keep, np.minimum(pairs, pairs_mono), 0.0)
    pairs_used = np.maximum(pairs_used, 0.0)
    tau = -1.0 + 2.0 * pairs_used.sum()
    tau = max(tau, 1.0 / np.log10(n * m + 10.0))
    return n * m / tau
