"""Forward-model tests: numerics against independent oracles (closed forms,
manufactured solutions, conservation laws, NumPy reassembly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu.models import burgers, darcy, kl, linear, ode


class TestKL:
    def test_sine_basis_orthonormal(self):
        n = 2048
        grid = (np.arange(n) + 0.5) / n
        B = kl.sine_basis(8, grid)
        gram = B @ B.T / n
        np.testing.assert_allclose(gram, np.eye(8), atol=1e-3)

    def test_fourier_basis_orthonormal(self):
        n = 2048
        grid = (np.arange(n) + 0.5) / n
        B = kl.fourier_basis(7, grid)
        gram = B @ B.T / n
        np.testing.assert_allclose(gram, np.eye(7), atol=1e-3)

    def test_2d_basis_orthonormal(self):
        B, ij = kl.sine_basis_2d(3, 64)
        gram = B @ B.T / (64 * 64)
        np.testing.assert_allclose(gram, np.eye(9), atol=1e-3)
        assert ij.shape == (9, 2)

    def test_matern_spectrum_decay_and_normalization(self):
        lam = kl.matern_eigenvalues(32, nu=1.5, lengthscale=0.3, variance=2.5)
        assert lam.shape == (32,)
        assert np.all(np.diff(lam) < 0)  # monotone decay in frequency
        np.testing.assert_allclose(lam.sum(), 2.5, rtol=1e-12)
        # smoother field (larger nu) decays faster at high frequency
        lam_smooth = kl.matern_eigenvalues(32, nu=2.5, lengthscale=0.3)
        ratio = lam_smooth / lam_smooth[0]
        assert ratio[-1] < (lam / lam[0])[-1]

    def test_matern_spectrum_2d(self):
        _, ij = kl.sine_basis_2d(4, 32)
        lam = kl.matern_eigenvalues_2d(ij, nu=1.5, lengthscale=0.2, variance=1.0)
        assert lam.shape == (16,)
        np.testing.assert_allclose(lam.sum(), 1.0, rtol=1e-12)

    def test_matern_covariance_closed_forms(self):
        x = np.linspace(0, 1, 9)
        for nu in (0.5, 1.5, 2.5, np.inf):
            C = kl.matern_covariance(x, nu=nu, lengthscale=0.4, variance=1.7)
            np.testing.assert_allclose(np.diag(C), 1.7, rtol=1e-12)
            np.testing.assert_allclose(C, C.T)
            w = np.linalg.eigvalsh(C)
            assert w.min() > -1e-8  # PSD
        with pytest.raises(ValueError):
            kl.matern_covariance(x, nu=1.7)

    def test_kl_from_covariance_reconstructs(self):
        # full-rank KL of a Matérn covariance reproduces the matrix:
        # C = Bᵀ diag(λ) B with orthonormal rows of B
        x = np.linspace(0, 1, 16)
        C = kl.matern_covariance(x, nu=1.5, lengthscale=0.3)
        B, lam = kl.kl_from_covariance(C, n_modes=16)
        np.testing.assert_allclose(B @ B.T, np.eye(16), atol=1e-10)
        np.testing.assert_allclose(B.T @ np.diag(lam) @ B, C, atol=1e-8)
        assert np.all(np.diff(lam) <= 1e-12)  # descending
        # truncation keeps the leading eigenpairs
        B4, lam4 = kl.kl_from_covariance(C, n_modes=4)
        np.testing.assert_allclose(lam4, lam[:4])

    def test_matern_prior_sample_variance(self, key):
        # field samples from the KL-truncated Matérn prior have the kernel's
        # pointwise variance (up to truncation + MC error)
        from ip_mcmc_tpu.distributions import gaussian_kl_prior

        n = 256
        grid = (np.arange(n) + 0.5) / n
        B = kl.sine_basis(64, grid)
        lam = kl.matern_eigenvalues(64, nu=1.5, lengthscale=0.25, variance=1.0)
        prior = gaussian_kl_prior(lam)
        coeffs = prior.sample(key, (4000,))
        fields = np.asarray(coeffs) @ B
        var_mid = fields[:, n // 2].var()
        # interior pointwise variance ≈ 2·Σλ_k sin²(·) averaged ≈ Σλ_k = 1
        assert 0.6 < var_mid < 1.5


class TestODE:
    def test_rk4_exponential_decay(self):
        # dy/dt = -y, y(0)=1 → y(t) = e^{-t}
        f = lambda y, p: -y
        traj = ode.rk4_integrate(f, jnp.array([1.0]), 0.01, 100)
        np.testing.assert_allclose(float(traj[-1, 0]), np.exp(-1.0), rtol=1e-5)

    def test_rk4_fourth_order_convergence(self):
        f = lambda y, p: -y
        errs = []
        for n in [2, 4]:  # coarse: truncation error above f32 roundoff
            traj = ode.rk4_integrate(f, jnp.array([1.0]), 1.0 / n, n)
            errs.append(abs(float(traj[-1, 0]) - np.exp(-1.0)))
        order = np.log2(errs[0] / max(errs[1], 1e-12))
        assert order > 3.5  # ~4 in exact arithmetic

    def test_logistic_closed_form(self):
        # dy = r y (1 - y/K): y(t) = K / (1 + (K/y0 - 1) e^{-rt})
        r, K, y0, t = 1.5, 2.0, 0.1, 2.0
        n = 400
        fwd = ode.make_logistic_forward(
            jnp.array([y0]), t / n, n, obs_indices=[n]
        )
        exact = K / (1 + (K / y0 - 1) * np.exp(-r * t))
        got = float(fwd(jnp.log(jnp.array([r, K])))[0])
        np.testing.assert_allclose(got, exact, rtol=1e-4)

    def test_lotka_volterra_conserved_quantity(self):
        # LV conserves V = δx − γ ln x + βy − α ln y
        theta = jnp.log(jnp.array([1.0, 0.5, 1.0, 0.5]))
        traj = ode.rk4_integrate(
            ode.lotka_volterra_field, jnp.array([1.0, 2.0]), 0.002, 2000, theta
        )
        a, b, g, d = np.exp(np.asarray(theta))
        x, y = np.asarray(traj[:, 0]), np.asarray(traj[:, 1])
        V = d * x - g * np.log(x) + b * y - a * np.log(y)
        assert np.abs(V - V[0]).max() < 1e-3

    def test_forward_is_differentiable(self):
        fwd = ode.make_lotka_volterra_forward(
            jnp.array([1.0, 1.0]), 0.01, 50, obs_indices=[25, 50]
        )
        theta = jnp.log(jnp.array([1.0, 0.5, 1.0, 0.5]))
        g = jax.grad(lambda t: jnp.sum(fwd(t)))(theta)
        assert np.all(np.isfinite(np.asarray(g)))
        # finite-difference check on one coordinate
        eps = 1e-3
        e0 = jnp.zeros(4).at[0].set(eps)
        fd = (jnp.sum(fwd(theta + e0)) - jnp.sum(fwd(theta - e0))) / (2 * eps)
        np.testing.assert_allclose(float(g[0]), float(fd), rtol=1e-2)


class TestDarcy:
    def test_constant_coefficient_vs_numpy_assembly(self):
        """a ≡ 1: compare the jitted dense assembly + Cholesky solve against
        an independently assembled NumPy system."""
        n = 8
        indices = darcy._stencil_indices(n)
        a = jnp.ones((n, n))
        A = np.asarray(darcy.assemble_operator(a, indices, n))
        # independent NumPy assembly
        N = n * n
        h2 = n * n
        A_ref = np.zeros((N, N))
        for i in range(n):
            for j in range(n):
                p = i * n + j
                for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                    ii, jj = i + di, j + dj
                    if 0 <= ii < n and 0 <= jj < n:
                        A_ref[p, ii * n + jj] -= h2
                        A_ref[p, p] += h2
                    else:
                        A_ref[p, p] += 2 * h2
        np.testing.assert_allclose(A, A_ref, rtol=1e-5)

    def test_poisson_series_solution(self):
        """a ≡ 1 (u = 0 KL coeffs): −Δp = 1 on unit square, p=0 boundary;
        compare center pressure to the exact series value ≈ 0.07367."""
        n = 32
        center = (n // 2) * n + n // 2
        fwd, aux = darcy.make_darcy_forward(
            n_grid=n, n_modes_per_dim=2, obs_indices=[center]
        )
        p_center = float(fwd(jnp.zeros(4))[0])
        exact = 0.0736713  # Σ series for −Δp=1, evaluated at (0.5, 0.5)
        np.testing.assert_allclose(p_center, exact, rtol=0.02)

    def test_spd_and_symmetry(self):
        n = 8
        indices = darcy._stencil_indices(n)
        rng = np.random.default_rng(0)
        a = jnp.asarray(np.exp(rng.standard_normal((n, n)) * 0.5))
        A = np.asarray(darcy.assemble_operator(a, indices, n))
        np.testing.assert_allclose(A, A.T, rtol=1e-5)
        assert np.linalg.eigvalsh(A).min() > 0

    def test_forward_differentiable(self):
        fwd, aux = darcy.make_darcy_forward(n_grid=8, n_modes_per_dim=2)
        u = 0.3 * jnp.ones(4)
        g = jax.grad(lambda v: jnp.sum(fwd(v)))(u)
        assert np.all(np.isfinite(np.asarray(g)))
        eps = 1e-2
        e0 = jnp.zeros(4).at[1].set(eps)
        fd = (jnp.sum(fwd(u + e0)) - jnp.sum(fwd(u - e0))) / (2 * eps)
        np.testing.assert_allclose(float(g[1]), float(fd), rtol=2e-2)

    def test_apply_operator_matches_assembled_matrix(self):
        """Matrix-free stencil apply == dense assembled matrix action."""
        n = 8
        rng = np.random.default_rng(5)
        a = jnp.asarray(np.exp(rng.standard_normal((n, n)) * 0.5), jnp.float32)
        p = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
        indices = darcy._stencil_indices(n)
        A = darcy.assemble_operator(a, indices, n)
        dense_action = (A @ p.reshape(-1)).reshape(n, n)
        free_action = darcy.apply_operator(a, p, n)
        np.testing.assert_allclose(
            np.asarray(free_action), np.asarray(dense_action), rtol=2e-4, atol=1e-3
        )

    def test_cg_matches_dense_solve(self):
        fwd_cg, _ = darcy.make_darcy_forward(
            n_grid=8, n_modes_per_dim=2, method="cg"
        )
        fwd_dense, _ = darcy.make_darcy_forward(
            n_grid=8, n_modes_per_dim=2, method="dense"
        )
        u = jnp.array([0.4, -0.3, 0.2, 0.5])
        np.testing.assert_allclose(
            np.asarray(fwd_cg(u)), np.asarray(fwd_dense(u)), rtol=1e-3, atol=1e-5
        )

    def test_cg_gradient_matches_dense_gradient(self):
        """Implicit adjoint through custom_linear_solve == AD through the
        dense Cholesky solve."""
        fwd_cg, _ = darcy.make_darcy_forward(n_grid=8, n_modes_per_dim=2, method="cg")
        fwd_dense, _ = darcy.make_darcy_forward(
            n_grid=8, n_modes_per_dim=2, method="dense"
        )
        u = jnp.array([0.4, -0.3, 0.2, 0.5])
        g_cg = jax.grad(lambda v: jnp.sum(fwd_cg(v)))(u)
        g_dense = jax.grad(lambda v: jnp.sum(fwd_dense(v)))(u)
        np.testing.assert_allclose(
            np.asarray(g_cg), np.asarray(g_dense), rtol=5e-3, atol=1e-5
        )

    def test_batched_forward_vmaps(self):
        fwd, aux = darcy.make_darcy_forward(n_grid=8, n_modes_per_dim=2)
        U = jnp.asarray(np.random.default_rng(1).standard_normal((16, 4)), jnp.float32)
        out = jax.vmap(fwd)(U)
        assert out.shape == (16, len(aux["obs_indices"]))
        assert np.all(np.isfinite(np.asarray(out)))


class TestBurgers:
    def test_godunov_flux_consistency(self):
        u = jnp.linspace(-2, 2, 9)
        np.testing.assert_allclose(
            np.asarray(burgers.godunov_flux(u, u)), 0.5 * np.asarray(u) ** 2, atol=1e-6
        )

    def test_mass_conservation_periodic(self):
        rng = np.random.default_rng(0)
        u0 = jnp.asarray(rng.standard_normal(128), jnp.float32)
        final = burgers.integrate(u0, dt=0.001, n_steps=200)
        np.testing.assert_allclose(
            float(jnp.sum(final)), float(jnp.sum(u0)), atol=1e-3
        )

    def test_shock_speed(self):
        """Riemann data u_l=1, u_r=0 → shock moving at speed 1/2."""
        n = 256
        x = (np.arange(n) + 0.5) / n
        u0 = jnp.asarray((x < 0.25).astype(np.float32))
        t = 0.3
        n_steps = 500
        final = burgers.integrate(u0, dt=t / n_steps, n_steps=n_steps)
        f = np.asarray(final)
        # shock initially at 0.25, moves at speed (u_l+u_r)/2 = 0.5 → 0.40
        # (periodic wrap also creates a rarefaction at x=0; the shock is the
        # rightmost cell still above half height)
        shock_pos = x[np.nonzero(f > 0.5)[0].max()]
        assert abs(shock_pos - 0.4) < 0.03

    def test_rarefaction(self):
        """u_l=0, u_r=1 edge → rarefaction fan, no entropy-violating shock."""
        n = 256
        x = (np.arange(n) + 0.5) / n
        u0 = jnp.asarray(((x > 0.25) & (x < 0.75)).astype(np.float32))
        final = burgers.integrate(u0, dt=0.001, n_steps=300)
        f = np.asarray(final)
        # left edge spreads: solution between 0 and 1, monotone increase there
        seg = f[(x > 0.26) & (x < 0.5)]
        assert np.all(np.diff(seg) > -1e-3)

    def test_forward_builder_shapes(self):
        fwd, aux = burgers.make_burgers_forward(n_cells=64, n_modes=8, t_final=0.1)
        out = fwd(jnp.zeros(8))
        assert out.shape == aux["obs_indices"].shape
        U = jnp.asarray(np.random.default_rng(2).standard_normal((8, 8)), jnp.float32)
        batch = jax.vmap(fwd)(U)
        assert batch.shape == (8, len(aux["obs_indices"]))
        assert np.all(np.isfinite(np.asarray(batch)))


class TestLinear:
    def test_conjugate_posterior_matches_direct(self):
        rng = np.random.default_rng(3)
        A = rng.standard_normal((5, 3))
        y = rng.standard_normal(5)
        mean, cov = linear.conjugate_posterior(
            A, np.zeros(3), np.eye(3), 0.25 * np.eye(5), y
        )
        # direct least-squares form
        prec = np.eye(3) + A.T @ A / 0.25
        np.testing.assert_allclose(cov, np.linalg.inv(prec), rtol=1e-8)
        np.testing.assert_allclose(mean, np.linalg.solve(prec, A.T @ y / 0.25), rtol=1e-8)


class TestDarcyAdjoint:
    """make_batched_misfit(differentiable=True): adjoint-method gradient."""

    def _setup(self):
        from ip_mcmc_tpu import distributions as dist
        from ip_mcmc_tpu import potentials

        fwd, aux = darcy.make_darcy_forward(
            n_grid=8, n_modes_per_dim=4, alpha=2.0, field_scale=10.0
        )
        m = 16
        noise = dist.DiagGaussian(mean=jnp.zeros(m), scale=0.002 * jnp.ones(m))
        u_true = jax.random.normal(jax.random.key(300), (16,))
        y = fwd(u_true) + noise.sample(jax.random.key(301))
        phi_std = potentials.misfit_potential(fwd, y, noise)
        phi_b = darcy.make_batched_misfit(aux, y, 0.002, differentiable=True)
        return phi_std, phi_b

    def test_adjoint_matches_implicit_ad(self):
        """Adjoint gradient == implicit-diff gradient of the standard path
        (custom_linear_solve) — two independent derivations."""
        phi_std, phi_b = self._setup()
        U = jax.random.normal(jax.random.key(7), (16, 4)) * 0.5
        v_b, v_s = phi_b(U), jax.vmap(phi_std)(U.T)
        np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_s), rtol=1e-4)
        g_b = jax.grad(lambda u: jnp.sum(phi_b(u)))(U)
        g_s = jax.vmap(jax.grad(phi_std))(U.T).T
        np.testing.assert_allclose(
            np.asarray(g_b), np.asarray(g_s), rtol=1e-3, atol=1e-3
        )

    def test_adjoint_matches_finite_differences(self):
        """O(1) noise scale so the f32 central difference doesn't cancel
        (phi ~ 1e4 at scale 0.002 leaves FD no mantissa to difference)."""
        from ip_mcmc_tpu import distributions as dist

        fwd, aux = darcy.make_darcy_forward(
            n_grid=8, n_modes_per_dim=4, alpha=2.0, field_scale=10.0
        )
        u_true = jax.random.normal(jax.random.key(300), (16,))
        y = fwd(u_true) + 0.1 * jax.random.normal(jax.random.key(301), (16,))
        phi_b = darcy.make_batched_misfit(aux, y, 0.5, differentiable=True)
        U = jax.random.normal(jax.random.key(9), (16, 2)) * 0.3
        g = jax.grad(lambda u: jnp.sum(phi_b(u)))(U)
        for (i, c) in [(0, 0), (5, 1), (11, 0)]:
            e = jnp.zeros_like(U).at[i, c].set(1e-2)
            fd = (phi_b(U + e) - phi_b(U - e))[c] / 2e-2
            np.testing.assert_allclose(float(g[i, c]), float(fd), rtol=3e-2, atol=1e-3)


class TestDSTPreconditioner:
    def test_basis_orthonormal(self):
        S, e = darcy.dst_basis(32)
        np.testing.assert_allclose(np.asarray(S @ S.T), np.eye(32), atol=1e-5)
        assert np.all(np.diff(np.asarray(e)) > 0)

    def test_exact_inverse_for_constant_field(self):
        """For a ≡ const the DST 'preconditioner' IS the exact inverse."""
        n = 16
        a = 2.7 * jnp.ones((n, n))
        inv_m = darcy.make_dst_preconditioner(a, n)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)),
                        jnp.float32)
        Ax = darcy.apply_operator(a, x, n)
        np.testing.assert_allclose(np.asarray(inv_m(Ax)), np.asarray(x),
                                   rtol=1e-3, atol=1e-4)

    def test_dst_beats_jacobi_on_large_grid(self):
        """n=64, smooth heterogeneous field: DST-PCG residual after 16
        iterations is orders of magnitude below Jacobi's."""
        n = 64
        rng = np.random.default_rng(1)
        modes = rng.standard_normal((4, 4))
        x1 = (np.arange(n) + 0.5) / n
        la = sum(
            0.4 * modes[i, j] * np.sin(np.pi*(i+1)*x1)[:, None]
            * np.sin(np.pi*(j+1)*x1)[None, :]
            for i in range(4) for j in range(4)
        )
        a = jnp.asarray(np.exp(la), jnp.float32)
        f = jnp.ones(n * n, jnp.float32)

        def resid(x):
            r = f.reshape(n, n) - darcy.apply_operator(a, x.reshape(n, n), n)
            return float(jnp.linalg.norm(r) / jnp.linalg.norm(f))

        r_dst = resid(darcy.solve_cg(a, f, n, n_iters=16, precond="dst"))
        r_jac = resid(darcy.solve_cg(a, f, n, n_iters=16, precond="jacobi"))
        assert r_dst < 1e-3, r_dst  # ~f32 floor for this conditioning
        assert r_dst < r_jac / 100.0, (r_dst, r_jac)

    def test_validation(self):
        a = jnp.ones((8, 8))
        with pytest.raises(ValueError):
            darcy.solve_cg(a, jnp.ones(64), 8, precond="ilu")
        with pytest.raises(ValueError):
            darcy.solve_cg(a, jnp.ones(64), 8, solver="jacobi")


class TestRichardsonSolver:
    """solver="richardson": the fixed-omega preconditioned iteration added
    for the DA surrogate misfits (no per-iteration dot products — see
    benchmarks/da_vpu_split.py for the measured rationale)."""

    def test_single_particle_matches_dense(self):
        """richardson-dst converges to the dense solve on a rough field
        (omega=0.9 at 3 iterations ~ CG-3 accuracy; 8 iterations tight)."""
        fwd_ri, _ = darcy.make_darcy_forward(
            n_grid=8, n_modes_per_dim=8, cg_iters=8, precond="dst",
            solver="richardson", omega=0.9)
        fwd_ex, _ = darcy.make_darcy_forward(
            n_grid=8, n_modes_per_dim=8, method="dense")
        u = jax.random.normal(jax.random.key(0), (64,))
        p_ri, p_ex = fwd_ri(u), fwd_ex(u)
        rel = float(jnp.abs(p_ri - p_ex).max() / jnp.abs(p_ex).max())
        assert rel < 2e-3, rel

    def test_batched_matches_cg_reference(self):
        """Batched richardson-dst_trunc misfit vs a deep-CG reference:
        3 iterations at omega=0.9 within the CG-3 accuracy class."""
        fwd_ex, aux = darcy.make_darcy_forward(
            n_grid=8, n_modes_per_dim=8, method="dense")
        u = jax.random.normal(jax.random.key(0), (64,))
        y = np.asarray(fwd_ex(u)) + 0.001
        phi_ref = darcy.make_batched_misfit(aux, y, 0.002, cg_iters=96)
        phi_ri = darcy.make_batched_misfit(
            aux, y, 0.002, cg_iters=3, precond="dst_trunc",
            precond_modes=64, solver="richardson", omega=0.9)
        U = jax.random.normal(jax.random.key(1), (64, 32))
        v_ref, v_ri = phi_ref(U), phi_ri(U)
        rel = float(jnp.abs(v_ri - v_ref).max() / jnp.abs(v_ref).max())
        assert rel < 0.05, rel

    def test_validation(self):
        _, aux = darcy.make_darcy_forward(n_grid=8, n_modes_per_dim=8)
        with pytest.raises(ValueError):
            darcy.make_batched_misfit(aux, np.zeros(16), 0.002,
                                      solver="sor")
        with pytest.raises(ValueError):
            # adjoint path stays on CG until a measured need exists
            darcy.make_batched_misfit(aux, np.zeros(16), 0.002,
                                      solver="richardson",
                                      differentiable=True)


class TestBurgersMultiTimeObservations:
    def test_multi_time_matches_recorded_trajectory(self):
        """obs_times forward == slicing the recorded trajectory at the
        snapped step indices."""
        times = [0.05, 0.1, 0.2]
        fwd, aux = burgers.make_burgers_forward(
            n_cells=64, n_modes=8, t_final=0.2, obs_times=times,
            mean_profile=np.sin(2 * np.pi * (np.arange(64) + 0.5) / 64),
        )
        u = jax.random.normal(jax.random.key(0), (8,)) * 0.5
        out = fwd(u)
        obs = np.asarray(aux["obs_indices"])
        assert out.shape == (3 * len(obs),)
        # oracle: integrate once recording every step
        u0 = aux["mean"] + u @ aux["scaled_basis"]
        _, traj = burgers.integrate(u0, aux["dt"], aux["n_steps"], record_every=1)
        steps = np.cumsum(aux["segment_steps"]) - 1
        expect = np.concatenate([np.asarray(traj[s])[obs] for s in steps])
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)

    def test_batched_misfit_matches_forward(self):
        times = [0.1, 0.2]
        fwd, aux = burgers.make_burgers_forward(
            n_cells=64, n_modes=8, t_final=0.2, obs_times=times,
        )
        u_true = jax.random.normal(jax.random.key(1), (8,)) * 0.5
        y = fwd(u_true)
        phi_b = burgers.make_batched_misfit(aux, y, 0.05)
        U = jax.random.normal(jax.random.key(2), (8, 4)) * 0.5
        got = phi_b(U)
        expect = jax.vmap(
            lambda u: 0.5 * jnp.sum(((y - fwd(u)) / 0.05) ** 2)
        )(U.T)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-4)

    def test_validation(self):
        with pytest.raises(ValueError):
            burgers.make_burgers_forward(t_final=0.2, obs_times=[0.1, 0.05])
        with pytest.raises(ValueError):
            burgers.make_burgers_forward(t_final=0.2, obs_times=[0.1, 0.3])
