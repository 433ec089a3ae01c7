import numpy as np
import pytest

from ladine_tpu.ops.schedules import DiffusionSchedule, make_beta_schedule

ALL = ["linear", "const", "quad", "jsd", "sigmoid", "cosine", "cosine_reverse", "cosine_anneal"]


@pytest.mark.parametrize("name", ALL)
def test_schedule_shape_and_range(name):
    betas = make_beta_schedule(name, 100, 1e-4, 0.02)
    assert betas.shape == (100,)
    assert np.all(betas > 0)
    assert np.all(betas <= 1)  # jsd ends at exactly 1


def test_linear_endpoints():
    betas = make_beta_schedule("linear", 1000, 1e-4, 0.02)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert np.all(np.diff(betas) > 0)


def test_jsd_is_harmonic():
    betas = make_beta_schedule("jsd", 10)
    assert betas[-1] == pytest.approx(1.0)
    assert betas[0] == pytest.approx(0.1)


def test_sigmoid_endpoints():
    betas = make_beta_schedule("sigmoid", 50, 1e-4, 0.02)
    # sigmoid(-6) ~ 0.0025, so start is slightly above 1e-4
    assert 1e-4 < betas[0] < 1e-3
    assert betas[-1] < 0.02


def test_cosine_capped():
    betas = make_beta_schedule("cosine", 1000)
    assert np.all(betas <= 0.999)


def test_cosine_anneal_endpoints():
    betas = make_beta_schedule("cosine_anneal", 100, 1e-4, 0.02)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)


def test_unknown_raises():
    with pytest.raises(ValueError):
        make_beta_schedule("nope", 10)


def test_schedule_precompute_consistency():
    s = DiffusionSchedule.create("linear", 1000, 1e-4, 0.02)
    assert s.num_timesteps == 1000
    np.testing.assert_allclose(np.asarray(s.alphas), 1.0 - np.asarray(s.betas), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.alphas_bar_sqrt) ** 2 + np.asarray(s.one_minus_alphas_bar_sqrt) ** 2,
        1.0,
        atol=1e-5,
    )
    # alphas_bar is strictly decreasing
    ab = np.asarray(s.alphas_bar)
    assert np.all(np.diff(ab) < 0)
    assert ab[0] == pytest.approx(1.0 - 1e-4, rel=1e-5)
