"""Adversarial audit of the fused kernels' counter-hash RNG (VERDICT
round-1 weak #3: "the headline numbers rest on this RNG; it deserves an
adversarial statistical test file of its own").

The stream model (ops/fused_mcmc.py): per block, ``block_seed = seed +
pid·7919`` (devices add a 1,000,003 stride); per (step, tag) a scalar key
``_mix_key(block_seed, step, tag)``; draws within a call are splitmix-
finalized functions of the element index (``_hash_bits``). This file
audits exactly that composition:

1. lattice-alias audit of the key schedule (this one CAUGHT a real bug:
   the round-1 linear mixer aliased at (Δseed=92, Δstep=56540) — kept
   here as the weakened-mixer meta-test, proving the battery has teeth);
2. birthday-bounded collision count over a realistic (seed, step, tag)
   key grid;
3. bit balance + input-bit avalanche of the element hash;
4. cross-lane / cross-block / lagged-step correlation of the actual
   normal draws;
5. large-scale moment battery for ``_normal`` (10⁷ default, 10⁸ @slow).

Every test uses fixed inputs — thresholds are deterministic margins, not
flaky MC gates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu.ops.fused_mcmc import _hash_bits, _mix_key, _normal, _uniform01

U32 = np.uint32


def _keys_for_steps(seed, steps, tag=0):
    """Vectorized _mix_key over a step range (numpy mirror via jnp)."""
    s = jnp.asarray(np.full(len(steps), seed, U32))
    i = jnp.asarray(np.asarray(steps, U32))
    return np.asarray(_mix_key(s, i, tag))


def _linear_mix_key(seed, step, tag):
    """The ROUND-1 mixer (linear in inputs pre-finalizer) — kept as the
    weakened reference the battery must flag."""
    k = (
        np.asarray(seed, U32) * U32(0x85EBCA6B)
        + np.asarray(step, U32) * U32(0xC2B2AE35)
        + U32(tag) * U32(0x27D4EB2F)
    )
    k = k ^ (k >> U32(13))
    return k * U32(0x165667B1)


class TestKeyScheduleLattice:
    """Exact-alias hunt: two streams (seed, ·) and (seed+Δs, ·) must not
    share keys beyond birthday chance for ANY step offset — checked by
    intersecting the full key sets (catches every Δstep at once)."""

    N_STEPS = 1 << 17  # covers the old mixer's Δstep=56540 alias

    def _overlap(self, mix, ds):
        steps = np.arange(self.N_STEPS)
        k0 = mix(0, steps, 0)
        k1 = mix(ds, steps, 0)
        return len(np.intersect1d(k0, k1))

    def test_new_mixer_has_no_small_alias(self):
        steps = np.arange(self.N_STEPS)
        vec = lambda s, st, t: _keys_for_steps(s, st, t)
        # birthday expectation for two 2^17 sets in 2^32: ~4 shared values
        for ds in (1, 2, 7, 92, 7919, 7919 * 105, 1_000_003):
            assert self._overlap(vec, ds) < 64, f"alias suspicion at Δseed={ds}"

    def test_old_linear_mixer_is_flagged(self):
        """Meta-test (battery teeth): the round-1 mixer aliases massively
        at Δseed=92 — (92·A + 56540·B ≡ 0 mod 2³²) — and this exact check
        detects it."""
        vec = lambda s, st, t: _linear_mix_key(s, np.asarray(st), t)
        assert self._overlap(vec, 92) > 10_000  # ~74k shifted-equal keys
        # and the new mixer at the same Δseed is clean (asserted above)

    def test_tag_channels_disjoint(self):
        steps = np.arange(1 << 15)
        k_t0 = _keys_for_steps(3, steps, 0)
        k_t1 = _keys_for_steps(3, steps, 1)
        k_t2 = _keys_for_steps(3, steps, 2)
        assert len(np.intersect1d(k_t0, k_t1)) < 16
        assert len(np.intersect1d(k_t1, k_t2)) < 16


class TestKeyCollisionBirthday:
    def test_realistic_grid_collisions_near_birthday(self):
        """Keys from a realistic launch grid (2 base seeds × 32 blocks ×
        8 devices × 4096 steps × 4 tags ≈ 8.4M keys) collide at the
        birthday rate of a uniform random function — far above means a
        structured mixer, far below means suspicious regularity."""
        base = np.array([1, 2], np.int64)
        blocks = np.arange(32, dtype=np.int64) * 7919
        devs = np.arange(8, dtype=np.int64) * 1_000_003
        seeds = (base[:, None, None] + blocks[None, :, None]
                 + devs[None, None, :]).ravel()
        steps = np.arange(4096)
        keys = []
        for tag in range(4):
            s = jnp.asarray(np.repeat(seeds.astype(U32), len(steps)))
            i = jnp.asarray(np.tile(steps.astype(U32), len(seeds)))
            keys.append(np.asarray(_mix_key(s, i, tag)))
        keys = np.concatenate(keys)
        n = len(keys)
        expected = n * (n - 1) / 2 / 2**32
        observed = n - len(np.unique(keys))
        # Poisson-ish: allow a wide but structure-detecting band
        assert 0.5 * expected < observed < 2.0 * expected, (
            f"collisions {observed} vs birthday {expected:.0f}"
        )


class TestBitQuality:
    def test_hash_bits_balanced_per_position(self):
        n = 1 << 20
        bits = np.asarray(_hash_bits(jnp.uint32(0xDEADBEEF), (1, n))).ravel()
        for b in range(32):
            frac = ((bits >> b) & 1).mean()
            # 5σ, σ = 0.5/√n ≈ 4.9e-4
            assert abs(frac - 0.5) < 5 * 0.5 / np.sqrt(n), (b, frac)

    def test_mix_key_avalanche(self):
        """Flipping any single input bit (of seed or step) flips ~16 of 32
        output bits on average."""
        rng = np.random.default_rng(0)
        base_seeds = rng.integers(0, 2**32, 256, dtype=np.uint64).astype(U32)
        base_steps = rng.integers(0, 2**20, 256, dtype=np.uint64).astype(U32)
        k0 = np.asarray(_mix_key(jnp.asarray(base_seeds),
                                 jnp.asarray(base_steps), 0))
        for b in list(range(0, 32, 3)):
            k_s = np.asarray(_mix_key(jnp.asarray(base_seeds ^ U32(1 << b)),
                                      jnp.asarray(base_steps), 0))
            ham = np.unpackbits((k0 ^ k_s).view(np.uint8)).sum() / 256
            assert 11.0 < ham < 21.0, (f"seed bit {b}", ham)
        for b in list(range(0, 20, 3)):
            k_i = np.asarray(_mix_key(jnp.asarray(base_seeds),
                                      jnp.asarray(base_steps ^ U32(1 << b)), 0))
            ham = np.unpackbits((k0 ^ k_i).view(np.uint8)).sum() / 256
            assert 11.0 < ham < 21.0, (f"step bit {b}", ham)

    def test_weakened_hash_is_flagged(self):
        """Meta-test (battery teeth): strip the finalizer multiplications
        from _hash_bits (leaving x = idx·φ + key with xorshifts only).
        Counter equidistribution keeps single-bit balance intact, so the
        detector with teeth is ADJACENT-ELEMENT correlation of the derived
        uniforms — near-affine in idx without the multiplies. The real
        hash must pass the identical check."""
        def to_uniform(bits):
            return (bits >> 8).astype(np.int64).astype(np.float64) / (1 << 24)

        def lag1(u):
            return abs(np.corrcoef(u[:-1], u[1:])[0, 1])

        n = 1 << 20
        idx = np.arange(n, dtype=U32)
        x = idx * U32(0x9E3779B9) + U32(0xDEADBEEF)
        x = x ^ (x >> U32(16))  # crippled: no multiplies
        x = x ^ (x >> U32(15))
        r_crippled = lag1(to_uniform(x))

        real = np.asarray(_hash_bits(jnp.uint32(0xDEADBEEF), (1, n))).ravel()
        r_real = lag1(to_uniform(real))

        thresh = 6.0 / np.sqrt(n)
        assert r_real < thresh, r_real
        assert r_crippled > 20 * thresh, r_crippled  # flagged loudly (~0.42)


class TestDrawCorrelation:
    """Correlations of the ACTUAL normal streams the kernels consume:
    across lanes (chains in a block), across blocks (pid stride 7919),
    and along steps (lags 1..4)."""

    D, B, N = 4, 64, 4096

    def _draws(self, pid):
        """(N, D, B) normals exactly as the fused step derives them."""
        block_seed = jnp.uint32(1 + pid * 7919)

        def one(i):
            return _normal(
                _mix_key(block_seed, jnp.uint32(i), 0),
                _mix_key(block_seed, jnp.uint32(i), 1),
                (self.D, self.B),
            )

        return np.asarray(jax.vmap(one)(jnp.arange(self.N, dtype=jnp.uint32)))

    def test_cross_lane_and_cross_block(self):
        z0 = self._draws(0)[:, 0, :]  # (N, B) first component per lane
        z1 = self._draws(1)[:, 0, :]
        x = np.concatenate([z0, z1], axis=1)  # 128 streams over N steps
        c = np.corrcoef(x.T)
        off = np.abs(c[np.triu_indices_from(c, 1)])
        # max over 8128 pairs of N=4096-sample correlations of independent
        # streams: E[max] ≈ √(2 ln 8128 / N) ≈ 0.066; 0.09 is a ~6σ margin
        assert off.max() < 0.09, off.max()

    def test_step_autocorrelation(self):
        z = self._draws(0)[:, 0, :8]  # 8 streams
        for lag in (1, 2, 3, 4):
            r = np.array([
                np.corrcoef(z[:-lag, j], z[lag:, j])[0, 1] for j in range(8)
            ])
            assert np.abs(r).max() < 6.0 / np.sqrt(self.N), (lag, r)

    def test_component_rows_uncorrelated(self):
        """Box–Muller pairs the cos/sin halves of the row axis — row i and
        row i+D/2 share (u1, u2). r and θ are independent under H0, so the
        PAIRED rows must still be uncorrelated (classic BM property, but
        worth pinning since we split the halves across components)."""
        z = self._draws(0)  # (N, D, B)
        flat = z.transpose(1, 0, 2).reshape(self.D, -1)
        c = np.corrcoef(flat)
        off = np.abs(c[np.triu_indices_from(c, 1)])
        assert off.max() < 6.0 / np.sqrt(flat.shape[1])


def _moment_battery(n_total, chunk=1 << 22):
    """Accumulate moments of _normal draws in chunks; z-test at 6σ."""
    d, b = 8, 512
    per_step = d * b
    n_steps = n_total // per_step
    s1 = s2 = s3 = s4 = tail3 = 0.0
    cnt = 0
    steps_per_chunk = max(1, chunk // per_step)

    @jax.jit
    def chunk_stats(i0):
        def one(i):
            z = _normal(
                _mix_key(jnp.uint32(9), i, 0),
                _mix_key(jnp.uint32(9), i, 1),
                (d, b),
            )
            return jnp.stack([
                jnp.sum(z), jnp.sum(z**2), jnp.sum(z**3), jnp.sum(z**4),
                jnp.sum((jnp.abs(z) > 3.0).astype(jnp.float32)),
            ])

        idx = i0 + jnp.arange(steps_per_chunk, dtype=jnp.uint32)
        return jax.vmap(one)(idx).sum(axis=0)

    i0 = 0
    while i0 < n_steps:
        st = np.asarray(chunk_stats(jnp.uint32(i0)), np.float64)
        s1 += st[0]; s2 += st[1]; s3 += st[2]; s4 += st[3]; tail3 += st[4]
        cnt += steps_per_chunk * per_step
        i0 += steps_per_chunk
    mean = s1 / cnt
    var = s2 / cnt - mean**2
    skew = s3 / cnt
    kurt = s4 / cnt
    p3 = tail3 / cnt
    return cnt, mean, var, skew, kurt, p3


def _assert_normal_moments(cnt, mean, var, skew, kurt, p3):
    z = 6.0
    assert abs(mean) < z * 1.0 / np.sqrt(cnt)
    assert abs(var - 1.0) < z * np.sqrt(2.0 / cnt)
    assert abs(skew) < z * np.sqrt(15.0 / cnt)  # var of z³ is 15
    assert abs(kurt - 3.0) < z * np.sqrt(96.0 / cnt)
    p = 2 * (1 - 0.9986501019683699)  # P(|Z|>3)
    assert abs(p3 - p) < z * np.sqrt(p * (1 - p) / cnt), (p3, p)


def test_normal_moments_1e7():
    _assert_normal_moments(*_moment_battery(10_000_000))


@pytest.mark.slow
def test_normal_moments_1e8():
    """The 10⁸-draw battery VERDICT asked for (≈40s CPU)."""
    _assert_normal_moments(*_moment_battery(100_000_000))


def test_uniform01_range_and_mean():
    u = np.asarray(_uniform01(jnp.uint32(0xABCD), (1, 1 << 20))).ravel()
    assert u.min() > 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 6 * np.sqrt(1.0 / 12 / len(u))
    assert abs(u.var() - 1.0 / 12) < 6 * np.sqrt(1.0 / 180 / len(u))
