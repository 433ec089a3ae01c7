"""MicroBatcher: coalescing, padding buckets, splitting, error propagation."""

import threading
import time

import numpy as np
import pytest

from ladine_tpu.infer import MicroBatcher
from ladine_tpu.infer.batching import _bucket


def _echo_fn(record):
    """A fake predict: returns each row's mean so callers can verify they
    got THEIR rows back; records call batch sizes."""

    def fn(images):
        record.append(len(images))
        return {"mean": images.mean(axis=(1, 2, 3)),
                "probs": np.stack([images.mean(axis=(1, 2, 3))] * 2, -1)}

    return fn


def test_bucket_sizes():
    assert [_bucket(n, 70) for n in (1, 2, 3, 5, 8, 9, 64, 65, 70)] == [
        1, 2, 4, 8, 8, 16, 64, 70, 70]


def test_single_request_roundtrip():
    calls = []
    b = MicroBatcher(_echo_fn(calls), max_batch=8, max_wait_ms=1)
    imgs = np.full((3, 4, 4, 3), 0.25, np.float32)
    out = b.predict(imgs)
    assert out["mean"].shape == (3,)
    np.testing.assert_allclose(out["mean"], 0.25)
    assert calls == [4]  # padded 3 -> bucket 4
    b.close()


def test_concurrent_requests_coalesce_and_split():
    calls = []
    b = MicroBatcher(_echo_fn(calls), max_batch=16, max_wait_ms=200)
    results = {}

    def worker(val, n):
        imgs = np.full((n, 4, 4, 3), val, np.float32)
        results[val] = b.predict(imgs)

    threads = [threading.Thread(target=worker, args=(v, n))
               for v, n in [(0.1, 2), (0.2, 3), (0.3, 1)]]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every caller got exactly its own rows back
    for v, n in [(0.1, 2), (0.2, 3), (0.3, 1)]:
        assert results[v]["mean"].shape == (n,)
        np.testing.assert_allclose(results[v]["mean"], v, rtol=1e-6)
    # and the 6 images went to the device in FEWER than 3 calls
    assert len(calls) < 3, calls
    stats = b.stats()
    assert stats["requests"] == 3 and stats["images"] == 6
    b.close()


def test_oversized_request_splits():
    calls = []
    b = MicroBatcher(_echo_fn(calls), max_batch=4, max_wait_ms=1)
    imgs = np.linspace(0, 1, 10 * 4 * 4 * 3, dtype=np.float32).reshape(10, 4, 4, 3)
    out = b.predict(imgs)
    assert out["mean"].shape == (10,)
    np.testing.assert_allclose(out["mean"], imgs.mean(axis=(1, 2, 3)), rtol=1e-5)
    assert all(c <= 4 for c in calls)
    b.close()


def test_error_propagates_to_caller():
    def boom(images):
        raise ValueError("bad batch")

    b = MicroBatcher(boom, max_batch=4, max_wait_ms=1)
    with pytest.raises(ValueError, match="bad batch"):
        b.predict(np.zeros((1, 4, 4, 3), np.float32))
    # the batcher survives and serves the next request's error too
    with pytest.raises(ValueError, match="bad batch"):
        b.predict(np.zeros((2, 4, 4, 3), np.float32))
    b.close()


def test_close_rejects_new_requests():
    b = MicroBatcher(_echo_fn([]), max_batch=4, max_wait_ms=1)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.predict(np.zeros((1, 4, 4, 3), np.float32))


def test_throughput_advantage_under_concurrency():
    """With a fixed per-call cost, batching N concurrent single-image
    requests must take ~1 call's time, not N."""
    CALL_COST = 0.05
    calls = []

    def slow_fn(images):
        calls.append(len(images))
        time.sleep(CALL_COST)
        return {"mean": images.mean(axis=(1, 2, 3))}

    b = MicroBatcher(slow_fn, max_batch=32, max_wait_ms=100)
    t0 = time.time()
    threads = [threading.Thread(
        target=lambda: b.predict(np.zeros((1, 4, 4, 3), np.float32)))
        for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.time() - t0
    assert elapsed < 8 * CALL_COST, f"no coalescing: {elapsed:.3f}s, calls={calls}"
    b.close()


def test_microbatcher_with_real_predictor():
    """End-to-end: concurrent callers through a real (tiny) Predictor get
    well-formed per-row outputs from a coalesced device call."""
    import jax
    import jax.numpy as jnp

    from ladine_tpu.infer import MicroBatcher, Predictor, stack_members
    from ladine_tpu.models import ConditionalModel, SEViTGuidance
    from ladine_tpu.ops import DiffusionSchedule

    g = SEViTGuidance(num_classes=2, num_members=2, vit_depth=2, img_size=16,
                      patch_size=8, embed_dim=16, num_heads=2,
                      mlp_hidden_dims=(16, 8, 8))
    gv = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    m = ConditionalModel(data_dim=768, feature_dim=8, hidden_dim=8, y_dim=2,
                         n_steps=11)
    members = [m.init(jax.random.PRNGKey(i), jnp.zeros((1, 768)),
                      jnp.zeros((1, 2)), jnp.asarray(0), jnp.full((1, 2), 0.5))
               for i in range(2)]
    predictor = Predictor(guidance=g, guidance_vars=gv, model=m,
                          stacked_vars=stack_members(members),
                          sched=DiffusionSchedule.create("linear", 10),
                          mc_trials=2, ddim_steps=5)
    b = MicroBatcher(predictor.predict, max_batch=8, max_wait_ms=100)
    imgs = np.random.default_rng(0).random((3, 16, 16, 3)).astype(np.float32)

    results = {}
    ths = [threading.Thread(target=lambda i=i: results.update(
        {i: b.predict(imgs[i:i + 1])})) for i in range(3)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    for i in range(3):
        assert results[i]["probs"].shape == (1, 2)
        assert np.isfinite(results[i]["probs"]).all()
        np.testing.assert_allclose(results[i]["probs"].sum(axis=-1), 1.0,
                                   rtol=1e-3)
    assert b.stats()["device_calls"] < 3
    b.close()
