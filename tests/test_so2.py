"""SO(2) schedule tests: table lookups vs the brute-force oracle, schedule
shape/invariant checks, and masked step behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from packppi_tpu.diffusion import SO2Schedule, SO2Tables, brute_force_score


@pytest.fixture(scope="module", params=[np.pi, np.pi / 2])
def tables(request):
    return SO2Tables.build(request.param)


def test_score_lookup_matches_brute_force(tables):
    """Table lookups agree with direct image summation away from bin edges."""
    rng = np.random.default_rng(1)
    PI = tables.PI
    sigma = np.exp(rng.uniform(np.log(0.05), np.log(PI), 256)).astype(np.float32)
    x = rng.uniform(-PI + 1e-3, PI - 1e-3, 256).astype(np.float32)

    got = np.asarray(tables.lookup_score(jnp.asarray(x), jnp.asarray(sigma)))
    want = brute_force_score(x.astype(np.float64), sigma.astype(np.float64), PI)

    # relative agreement except where |score| is tiny (bin quantization)
    denom = np.maximum(np.abs(want), 0.5)
    rel = np.abs(got - want) / denom
    assert np.quantile(rel, 0.95) < 0.02
    assert np.median(rel) < 0.005


def test_score_is_odd_in_x(tables):
    x = jnp.linspace(0.01, tables.PI - 0.01, 64)
    s = jnp.full_like(x, 0.5 * tables.PI)
    np.testing.assert_allclose(
        np.asarray(tables.lookup_score(x, s)),
        -np.asarray(tables.lookup_score(-x, s)),
        atol=1e-6,
    )


def test_score_norm_positive_and_decreasing_in_sigma(tables):
    # at small sigma the wrapped normal is sharp -> large E[score^2]
    sig = jnp.asarray([0.05, 0.2, 1.0]) * tables.PI
    sn = np.asarray(tables.lookup_score_norm(sig))
    assert (sn > 0).all()
    assert sn[0] > sn[1] > sn[2]


def test_t_to_sigma_endpoints():
    sched = SO2Schedule.create(pi_periodic=False)
    np.testing.assert_allclose(float(sched.t_to_sigma(0.0)), sched.sigma_min, rtol=1e-6)
    np.testing.assert_allclose(float(sched.t_to_sigma(1.0)), sched.sigma_max, rtol=1e-6)
    assert len(sched.reverse_t_schedule) == 31
    assert sched.reverse_t_schedule[0] == 1.0 and sched.reverse_t_schedule[-1] == 0.0


def test_add_noise_respects_mask():
    sched = SO2Schedule.create(pi_periodic=False)
    key = jax.random.key(0)
    x = jnp.zeros((6, 4))
    t = jnp.full((6,), 0.7)
    mask = jnp.zeros((6, 4)).at[:, :2].set(1.0)
    noisy, score = sched.add_noise(key, x, t, mask)
    assert np.asarray(noisy[:, 2:] == 0).all()
    assert np.asarray(score[:, 2:] == 0).all()
    assert np.abs(np.asarray(noisy[:, :2])).mean() > 0.1


def test_step_only_updates_masked_entries():
    sched = SO2Schedule.create(pi_periodic=False)
    key = jax.random.key(1)
    x = jnp.ones((5, 4)) * 0.3
    score = jnp.ones((5, 4))
    mask = jnp.zeros((5, 4), bool).at[:, 0].set(True)
    out = sched.step(key, x, score, t=jnp.asarray(0.5), dt=jnp.asarray(1 / 30), x_mask=mask)
    assert not np.allclose(np.asarray(out[:, 0]), 0.3)
    np.testing.assert_allclose(np.asarray(out[:, 1:]), 0.3)


def test_step_correct_moves_toward_score():
    sched = SO2Schedule.create(pi_periodic=False)
    key = jax.random.key(2)
    x = jnp.zeros((2, 16, 4))
    score = jnp.ones((2, 16, 4)) * 2.0
    mask = jnp.ones((2, 16, 4), bool)
    out = sched.step_correct(key, x, score, mask)
    assert float(jnp.mean(out)) > 0  # drift follows the score on average


def test_lookup_matches_reference_binning():
    """Our lookups vs the reference's own table construction + log-binned
    lookup code on identical (x, sigma) inputs (golden from the reference)."""
    import os

    from conftest import GOLDEN

    path = os.path.join(GOLDEN, "so2_lookup_golden.npz")
    z = np.load(path)
    for name, pi_periodic in [("pi", True), ("2pi", False)]:
        sched = SO2Schedule.create(pi_periodic=pi_periodic)
        x = jnp.asarray(z["x"], jnp.float32)
        sigma = jnp.asarray(z[f"sigma_{name}"], jnp.float32)

        got = np.asarray(sched.tables.lookup_score(x, sigma), np.float64)
        want = z[f"score_{name}"]
        # identical binning; tolerance covers f32 vs f64 table construction
        # and bin-edge rounding (a tiny fraction may land one bin over)
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1.0)
        assert np.quantile(rel, 0.95) < 0.01
        assert np.median(rel) < 1e-3

        got_n = np.asarray(sched.tables.lookup_score_norm(sigma), np.float64)
        want_n = z[f"score_norm_{name}"]
        # reference score_norm is an UNSEEDED 10k-sample MC estimate; ours is
        # deterministic quadrature — agreement within MC noise (~2%)
        reln = np.abs(got_n - want_n) / np.maximum(np.abs(want_n), 1e-9)
        assert np.median(reln) < 0.03
        assert np.quantile(reln, 0.95) < 0.08


def test_step_correct_per_schedule_composition():
    """The sampler's corrector applies each periodicity's step_correct under
    its own mask (reference: src/models/components/schedule.py:237-273 is a
    per-schedule method). With disjoint masks the composition must equal each
    schedule's standalone update on its own chi subset — i.e. the pi-periodic
    step size is computed from pi-periodic chis only."""
    sp = SO2Schedule.create(pi_periodic=True)
    s2 = SO2Schedule.create(pi_periodic=False)
    k1, k2 = jax.random.split(jax.random.key(7))
    kx, ks = jax.random.split(jax.random.key(8))
    x = jax.random.uniform(kx, (2, 8, 4), minval=-np.pi, maxval=np.pi)
    score = jax.random.normal(ks, (2, 8, 4))
    valid = np.zeros((2, 8, 4), bool)
    valid[:, :6] = True
    m1 = valid & (np.arange(4) % 2 == 0)   # "pi-periodic" chis
    m2 = valid & ~m1                       # 2pi-periodic chis

    composed = s2.step_correct(k2, sp.step_correct(k1, x, score, m1), score, m2)
    a = sp.step_correct(k1, x, score, m1)  # same keys -> same noise draws
    b = s2.step_correct(k2, x, score, m2)
    expected = np.where(m1, np.asarray(a), np.where(m2, np.asarray(b), np.asarray(x)))
    np.testing.assert_allclose(np.asarray(composed), expected, atol=1e-6)

    # masked-out entries never move
    np.testing.assert_allclose(np.asarray(composed)[~valid], np.asarray(x)[~valid])
