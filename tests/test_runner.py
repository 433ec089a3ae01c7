"""Runner orchestration unit tests (demo mode, tiny)."""

import jax
import numpy as np
import pytest

from ladine_tpu.config import Config
from ladine_tpu.cli.runner import Runner


@pytest.fixture(scope="module")
def demo_runner(tmp_path_factory):
    cfg = Config()
    cfg.diffusion.timesteps = 10
    cfg.diffusion.num_members = 3
    cfg.training.batch_size = 8
    return Runner(cfg, log_dir=str(tmp_path_factory.mktemp("logs")), demo=True)


def test_demo_batches_separable(demo_runner):
    batches = list(demo_runner.batches("train", 8))
    assert len(batches) == 3
    images, labels = batches[0]
    assert images.shape == (8, 16, 16, 3)
    # class-dependent brightness: mean pixel value correlates with label
    means = images.mean(axis=(1, 2, 3))
    if (labels == 0).any() and (labels == 1).any():
        assert means[labels == 1].mean() > means[labels == 0].mean()


def test_num_batches_demo(demo_runner):
    assert demo_runner.num_batches("train", 8) == 3


def test_pretrain_and_evaluate_guidance(demo_runner):
    gvars = demo_runner.init_guidance(jax.random.PRNGKey(0))
    acc_before = demo_runner.evaluate_guidance(gvars)
    gvars = demo_runner.pretrain_guidance(gvars, steps=40)
    acc_after = demo_runner.evaluate_guidance(gvars)
    assert acc_after >= acc_before
    assert acc_after > 60.0  # separable data learns fast


def test_train_single_member_and_out_of_range(demo_runner):
    result = demo_runner.train(jax.random.PRNGKey(0), epochs=1, member_idx=1)
    # one member trained: losses vector had length 1 -> states stacked dim 1
    assert result["states"].step.shape == (1,)
    with pytest.raises(ValueError):
        demo_runner.train(jax.random.PRNGKey(0), epochs=1, member_idx=7)


@pytest.mark.slow
def test_joint_train_saves_and_resumes_aux(tmp_path):
    import os

    cfg = Config()
    cfg.diffusion.timesteps = 10
    cfg.diffusion.num_members = 2
    cfg.training.batch_size = 8
    cfg.training.validation_freq = 1
    r = Runner(cfg, log_dir=str(tmp_path), demo=True)
    result = r.train(jax.random.PRNGKey(0), epochs=1, joint_train=True)
    ckpt = result["best_ckpt_path"]
    assert ckpt and os.path.exists(ckpt + "_aux"), "aux sibling checkpoint missing"
    # resume restores the aux state (no exception, epoch advances)
    result2 = r.train(jax.random.PRNGKey(0), epochs=2, joint_train=True,
                      resume_from=ckpt)
    assert result2["steps"] == 3  # epochs 1..1 remaining x 3 demo batches


def test_maybe_mesh_single_device(demo_runner):
    # tests run on 8 CPU devices; batch 8 tiles -> mesh exists
    mesh = demo_runner._maybe_mesh(8)
    if len(jax.devices()) > 1:
        assert mesh is not None
        assert mesh.axis_names == ("member", "data")
    # batch of 7 with 3 members: data axis candidates 8,7,...; 7 tiles it
    mesh7 = demo_runner._maybe_mesh(7)
    assert mesh7 is None or 7 % mesh7.devices.shape[1] == 0
