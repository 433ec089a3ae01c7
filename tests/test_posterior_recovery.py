"""End-to-end statistical correctness: a CARD member trained on a 1-D GMM
recovers the analytic Bayes posterior via MC vote fractions (the method's
core claim; full-strength version in examples/gmm_posterior.py reaches
MAE ~0.013)."""

import sys

sys.path.insert(0, ".")


def test_gmm_posterior_recovery():
    from examples.gmm_posterior import run

    mae = run(n_train_steps=700, mc_trials=40, verbose=False)
    assert mae < 0.15, f"posterior MAE {mae:.3f} too high — diffusion machinery drifted"
